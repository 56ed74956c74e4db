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

    def _prompt_batch(self, pts01):
        """Batched single-point prompts against the cached embedding.
        pts01 (B, 2) xy in [0, 1]. Returns (multimask logits (B, 3, h, w),
        iou (B, 3)) — the grid-generate hook."""
        import jax.numpy as jnp

        assert self._embed is not None, "call set_image() first"
        B = len(pts01)
        e = jnp.broadcast_to(self._embed, (B, *self._embed.shape[1:]))
        p = jnp.asarray(pts01, jnp.float32)[:, None, :]
        l = jnp.ones((B, 1), jnp.int32)
        masks, iou = self._prompt(self.variables, e, p, l)
        return masks[:, 1:], iou[:, 1:]

    def generate(self, img, **kw):
        """Segment everything via the point-grid sweep (predict.py:297)."""
        return grid_generate(self, img, **kw)

    def info(self):
        import jax

        n = sum(x.size for x in jax.tree_util.tree_leaves(self.variables))
        LOGGER.info(f"SAM: {n:,} params, encoder img_size {self.img_size}")
        return n


def grid_generate(fac, img, points_per_side: int = 16, points_per_batch: int = 64,
                  pred_iou_thresh: float = 0.88, stability_thresh: float = 0.95,
                  stability_offset: float = 1.0, nms_iou: float = 0.7,
                  min_area: int = 0):
    """Segment everything: regular point-grid sweep + quality filtering + NMS
    (reference sam/predict.py:297 Predictor.generate, crop_n_layers=0 path).

    Works with both the SAM and SAM2 facades (anything exposing set_image()
    and _prompt_batch()). Returns a list of dicts with keys
    {"segmentation" (H, W) bool, "bbox" xyxy, "predicted_iou", "stability_score"}.
    """
    import jax.image as jimg
    import jax.numpy as jnp

    fac.set_image(img)
    h, w = img.shape[:2]
    side = points_per_side
    xs = (np.arange(side) + 0.5) / side
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)  # (P,2) xy

    cand_masks, cand_iou, cand_stab = [], [], []
    for i in range(0, len(grid), points_per_batch):
        chunk = grid[i : i + points_per_batch]
        if len(chunk) < points_per_batch:  # static shapes: pad, mask later
            pad = np.tile(chunk[-1:], (points_per_batch - len(chunk), 1))
            real = len(chunk)
            chunk = np.concatenate([chunk, pad], 0)
        else:
            real = len(chunk)
        logits, ious = fac._prompt_batch(chunk)  # (B,K,h',w'), (B,K)
        logits = np.asarray(logits)[:real]
        ious = np.asarray(ious)[:real]
        B, K = ious.shape
        flat = logits.reshape(B * K, *logits.shape[2:])
        fi = ious.reshape(B * K)
        area_i = (flat > stability_offset).sum((1, 2)).astype(np.float64)
        area_u = (flat > -stability_offset).sum((1, 2)).astype(np.float64)
        stab = np.where(area_u > 0, area_i / np.maximum(area_u, 1), 1.0)
        keep = (fi > pred_iou_thresh) & (stab > stability_thresh)
        if keep.any():
            cand_masks.append(flat[keep] > 0.0)
            cand_iou.append(fi[keep])
            cand_stab.append(stab[keep])
    if not cand_masks:
        return []
    masks = np.concatenate(cand_masks, 0)
    ious = np.concatenate(cand_iou, 0)
    stabs = np.concatenate(cand_stab, 0)

    # boxes from masks (low-res space), drop empties/small
    boxes = np.zeros((len(masks), 4), np.float32)
    ok = np.zeros(len(masks), bool)
    for i, m in enumerate(masks):
        ys, xs_ = np.nonzero(m)
        if len(ys) <= min_area:
            continue
        boxes[i] = [xs_.min(), ys.min(), xs_.max() + 1, ys.max() + 1]
        ok[i] = True
    masks, boxes, ious, stabs = masks[ok], boxes[ok], ious[ok], stabs[ok]
    if not len(masks):
        return []

    # greedy NMS by predicted IoU (class-agnostic)
    order = np.argsort(-ious)
    kept = []
    for i in order:
        bi = boxes[i]
        dup = False
        for j in kept:
            bj = boxes[j]
            iw = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            ih = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = iw * ih
            ua = ((bi[2] - bi[0]) * (bi[3] - bi[1])
                  + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter)
            if ua > 0 and inter / ua > nms_iou:
                dup = True
                break
        if not dup:
            kept.append(i)

    # post-filter: fill small holes / drop small islands, then re-NMS the
    # recomputed boxes preferring masks that needed no repair (reference
    # Predictor.remove_small_regions, sam/predict.py:571-620)
    if min_area > 0 and kept:
        sub, keep2 = remove_small_regions(masks[kept], min_area, nms_thresh=nms_iou)
        kept = [kept[j] for j in keep2]
        masks[kept] = sub  # repaired masks replace the originals

    out = []
    lh, lw = masks.shape[1:]
    for i in kept:
        big = jimg.resize(jnp.asarray(masks[i], jnp.float32), (h, w), method="bilinear")
        seg = np.asarray(big > 0.5)
        sx, sy = w / lw, h / lh
        out.append({
            "segmentation": seg,
            "bbox": [float(boxes[i][0] * sx), float(boxes[i][1] * sy),
                     float(boxes[i][2] * sx), float(boxes[i][3] * sy)],
            "predicted_iou": float(ious[i]),
            "stability_score": float(stabs[i]),
        })
    return out


def remove_small_regions(masks, min_area: int = 0, nms_thresh: float = 0.7):
    """Repair masks, then dedup: fill holes and drop islands smaller than
    min_area (scipy connected components), recompute boxes and greedy-NMS
    them with score 1 for untouched masks / 0 for repaired ones so unrepaired
    masks win ties (reference sam/predict.py:571-620 remove_small_regions).

    masks: (N, H, W) bool-ish. Returns (new_masks (M, H, W) bool, keep idx).
    """
    from scipy import ndimage

    masks = np.asarray(masks).astype(bool)
    if len(masks) == 0:
        return masks, []
    new_masks, scores = [], []
    for m in masks:
        changed = False
        for mode in ("holes", "islands"):
            work = ~m if mode == "holes" else m
            lab, n = ndimage.label(work)
            if n:
                sizes = ndimage.sum(work, lab, index=np.arange(1, n + 1))
                small = np.flatnonzero(sizes < min_area) + 1
                if len(small):
                    changed = True
                    fill = np.isin(lab, small)
                    m = (m | fill) if mode == "holes" else (m & ~fill)
        new_masks.append(m)
        scores.append(0.0 if changed else 1.0)
    boxes = np.zeros((len(new_masks), 4), np.float32)
    for i, m in enumerate(new_masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    order = np.argsort(-np.asarray(scores), kind="stable")
    keep = []
    for i in order:
        bi = boxes[i]
        dup = False
        for j in keep:
            bj = boxes[j]
            iw = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            ih = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = iw * ih
            ua = ((bi[2] - bi[0]) * (bi[3] - bi[1])
                  + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter)
            if ua > 0 and inter / ua > nms_thresh:
                dup = True
                break
        if not dup:
            keep.append(int(i))
    keep.sort()
    return np.stack([new_masks[i] for i in keep]), keep
