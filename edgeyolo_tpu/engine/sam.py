"""SAM facade: promptable segmentation with encode-once / prompt-many.

Behavioral spec: reference ultralytics/models/sam/model.py:26 (SAM facade,
pt/info/predict surface) and sam/predict.py:37 (Predictor.prompt_inference:
points + labels, boxes as 2-corner prompts with labels (2,3), optional mask
input, multimask_output selection by IoU prediction).
"""

from __future__ import annotations

import numpy as np

from edgeyolo_tpu.nn.sam import build_sam
from edgeyolo_tpu.utils import LOGGER


class SAM:
    """Promptable segmentation handle.

    >>> sam = SAM("vit_b", img_size=256)   # random-init; .pt convert: round 2
    >>> sam.set_image(img)                 # HWC uint8/float
    >>> masks, ious = sam(points=[[100, 200]], labels=[1])
    >>> masks, ious = sam(bboxes=[50, 60, 180, 220])
    """

    def __init__(self, model: str = "vit_b", img_size: int = 1024, seed: int = 0):
        import jax

        if str(model).endswith((".pt", ".pth")):
            raise NotImplementedError("SAM .pt weight conversion lands next round; pass a variant name")
        self.img_size = int(img_size)
        self.net = build_sam(str(model), img_size=self.img_size)
        dummy = (np.zeros((1, self.img_size, self.img_size, 3), np.float32),
                 np.zeros((1, 1, 2), np.float32), np.zeros((1, 1), np.int32))
        self.variables = jax.jit(self.net.init)(jax.random.PRNGKey(seed), *dummy)
        self._embed = None
        self._hw = None
        self._encode = jax.jit(lambda v, x: self.net.apply(v, x, method="encode"))
        self._prompt = jax.jit(lambda v, e, p, l: self.net.apply(v, e, p, l, method="prompt"))
        LOGGER.info(f"SAM {model} ready (img_size={self.img_size})")

    def set_image(self, img: np.ndarray):
        """Resize + normalize one HWC image and cache its embedding."""
        import jax.image as jimg
        import jax.numpy as jnp

        h, w = img.shape[:2]
        self._hw = (h, w)
        x = jnp.asarray(img, jnp.float32)
        if x.ndim == 2:
            x = x[..., None] * jnp.ones((1, 1, 3))
        x = jimg.resize(x, (self.img_size, self.img_size, 3), method="bilinear")
        mean = jnp.asarray([123.675, 116.28, 103.53])
        std = jnp.asarray([58.395, 57.12, 57.375])
        x = (x - mean) / std
        self._embed = self._encode(self.variables, x[None])
        return self

    def __call__(self, points=None, labels=None, bboxes=None, multimask_output: bool = False):
        """Run one prompt against the cached embedding.

        points: (N,2) pixel coords in the ORIGINAL image; labels: (N,) 1=fg
        0=bg; bboxes: (4,) or (K,4) xyxy. Returns (masks (K,H,W) bool at the
        original resolution, iou_pred (K,)).
        """
        import jax.image as jimg
        import jax.numpy as jnp

        assert self._embed is not None, "call set_image() first"
        h, w = self._hw
        pts, labs = [], []
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.float32))
            pts.append(p / [w, h])
            labs.append(np.asarray(labels if labels is not None else np.ones(len(p)), np.int32))
        if bboxes is not None:
            b = np.atleast_2d(np.asarray(bboxes, np.float32))
            for x1, y1, x2, y2 in b:
                pts.append(np.asarray([[x1 / w, y1 / h], [x2 / w, y2 / h]], np.float32))
                labs.append(np.asarray([2, 3], np.int32))
        if not pts:
            raise ValueError("provide points and/or bboxes")
        p = np.concatenate(pts, 0)[None]
        l = np.concatenate(labs, 0)[None]
        masks, iou = self._prompt(self.variables, self._embed, jnp.asarray(p), jnp.asarray(l))
        if multimask_output:
            masks, iou = masks[:, 1:], iou[:, 1:]
            best = int(jnp.argmax(iou[0]))
        else:
            best = 0
        m = jimg.resize(masks[0, best], (h, w), method="bilinear")
        return np.asarray(m > 0.0)[None], np.asarray(iou[0, best : best + 1])

    def info(self):
        import jax

        n = sum(x.size for x in jax.tree_util.tree_leaves(self.variables))
        LOGGER.info(f"SAM: {n:,} params, encoder img_size {self.img_size}")
        return n
