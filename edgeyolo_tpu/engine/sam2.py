"""SAM2 facades: promptable image segmentation + memory-based video tracking.

Behavioral spec: ultralytics/models/sam/predict.py:623 (SAM2Predictor),
:815 (SAM2VideoPredictor: per-frame memory bank, conditioning-frame outputs,
obj-ptr cross attention) and modules/sam.py:620-972 (track_step + memory
selection). The memory bank lives on the host as numpy; device work runs
through jitted SAM2Model methods. Shapes retrace only while the bank ramps
to (num_maskmem, max_obj_ptrs) and are then stable for the whole video.
"""

from __future__ import annotations

import numpy as np

from edgeyolo_tpu.nn.sam2 import build_sam2
from edgeyolo_tpu.utils import LOGGER

_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


class SAM2:
    """Promptable image segmentation with a SAM2 (Hiera) backbone.

    >>> sam = SAM2("sam2_t", img_size=256)
    >>> sam.set_image(img)
    >>> masks, ious = sam(points=[[100, 200]], labels=[1])
    """

    def __init__(self, model: str = "sam2_t", img_size: int = 1024, seed: int = 0):
        import jax
        import jax.numpy as jnp

        if str(model).endswith((".pt", ".pth")):
            raise NotImplementedError(
                "SAM2 .pt import: convert via utils.torch_convert.convert_sam2_state_dict")
        self.img_size = int(img_size)
        self.net = build_sam2(str(model), img_size=self.img_size)
        x = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
        pts = jnp.zeros((1, 1, 2), jnp.float32)
        labs = jnp.zeros((1, 1), jnp.int32)
        self.variables = jax.jit(self.net.init)(jax.random.PRNGKey(seed), x, pts, labs)
        self._encode = jax.jit(lambda v, xx: self.net.apply(v, xx, method="encode_image"))
        self._heads = jax.jit(
            lambda v, f, p, l, s0, s1: self.net.apply(
                v, f, p, l, s0, s1, multimask_output=True, method="sam_heads"),
        )
        self._enc_out = None
        self._hw = None
        LOGGER.info(f"SAM2 {model} ready (img_size={self.img_size})")

    def _preprocess(self, img: np.ndarray):
        import jax.image as jimg
        import jax.numpy as jnp

        x = jnp.asarray(img, jnp.float32)
        if x.ndim == 2:
            x = x[..., None] * jnp.ones((1, 1, 3))
        x = jimg.resize(x, (self.img_size, self.img_size, 3), method="bilinear")
        return ((x - _MEAN) / _STD)[None]

    def set_image(self, img: np.ndarray):
        self._hw = img.shape[:2]
        self._enc_out = self._encode(self.variables, self._preprocess(img))
        return self

    def __call__(self, points=None, labels=None, bboxes=None, multimask_output: bool = False):
        """Prompt the cached embedding. Coordinates are pixels in the
        original image. Returns (masks (1, H, W) bool, iou (1,))."""
        import jax.image as jimg
        import jax.numpy as jnp

        assert self._enc_out is not None, "call set_image() first"
        h, w = self._hw
        pts, labs = [], []
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.float32))
            pts.append((p * [self.img_size / w, self.img_size / h] + 0.5) / self.img_size)
            labs.append(np.asarray(labels if labels is not None else np.ones(len(p)), np.int32))
        if bboxes is not None:
            b = np.atleast_2d(np.asarray(bboxes, np.float32))
            for x1, y1, x2, y2 in b:
                q = np.asarray([[x1 / w, y1 / h], [x2 / w, y2 / h]], np.float32)
                pts.append(q)
                labs.append(np.asarray([2, 3], np.int32))
        if not pts:
            raise ValueError("provide points and/or bboxes")
        p = np.concatenate(pts, 0)[None]
        l = np.concatenate(labs, 0)[None]
        enc = self._enc_out
        feat = enc["feat"] + self.variables["params"]["no_mem_embed"][0, 0]
        out = self._heads(self.variables, feat, jnp.asarray(p), jnp.asarray(l),
                          enc["feat_s0"], enc["feat_s1"])
        low_multi, ious, low_res, hi, obj_ptr, obj_logits = out
        if multimask_output:
            best = int(jnp.argmax(ious[0]))
            m = low_multi[0, best]
        else:
            m = low_res[0, 0]
            best = 0
        m = jimg.resize(m, (h, w), method="bilinear")
        return np.asarray(m > 0.0)[None], np.asarray(ious[0, best : best + 1])

    def _prompt_batch(self, pts01):
        """Batched single-point prompts for grid_generate: (B, 2) xy in
        [0, 1] -> (multimask logits (B, 3, h, w), iou (B, 3))."""
        import jax.numpy as jnp

        assert self._enc_out is not None, "call set_image() first"
        enc = self._enc_out
        B = len(pts01)
        feat = enc["feat"] + self.variables["params"]["no_mem_embed"][0, 0]
        feat = jnp.broadcast_to(feat, (B, *feat.shape[1:]))
        s0 = jnp.broadcast_to(enc["feat_s0"], (B, *enc["feat_s0"].shape[1:]))
        s1 = jnp.broadcast_to(enc["feat_s1"], (B, *enc["feat_s1"].shape[1:]))
        p = jnp.asarray(pts01, jnp.float32)[:, None, :]
        l = jnp.ones((B, 1), jnp.int32)
        out = self._heads(self.variables, feat, p, l, s0, s1)
        return out[0], out[1]

    # segment-everything sweep shared with SAM1 (engine/sam.py:generate)
    def generate(self, img, **kw):
        from edgeyolo_tpu.engine.sam import grid_generate

        return grid_generate(self, img, **kw)


class SAM2VideoPredictor:
    """Promptable video object tracking with a per-frame memory bank.

    Usage:
        vp = SAM2VideoPredictor("sam2_t", img_size=256)
        vp.init_state(frames)                       # list/iter of HWC uint8
        vp.add_points(frame_idx=0, points=[[x, y]], labels=[1])
        for fidx, mask, score in vp.propagate():    # yields per frame
            ...
    """

    def __init__(self, model: str = "sam2_t", img_size: int = 1024, seed: int = 0,
                 num_maskmem: int = 7, max_obj_ptrs: int = 16):
        import jax
        import jax.numpy as jnp

        self.sam = SAM2(model, img_size=img_size, seed=seed)
        self.net = self.sam.net
        self.variables = self.sam.variables
        self.num_maskmem = num_maskmem
        self.max_obj_ptrs = max_obj_ptrs
        self._heads_single = jax.jit(
            lambda v, f, p, l, s0, s1: self.net.apply(
                v, f, p, l, s0, s1, multimask_output=False, method="sam_heads"))
        self._heads_multi = self.sam._heads
        self._condition = jax.jit(
            lambda v, f, pos, mem, mpos, nptr: self.net.apply(
                v, f, pos, mem, mpos, nptr, method="condition_features"),
            static_argnums=(5,))
        self._encode_mem = jax.jit(
            lambda v, f, hi, ol: self.net.apply(v, f, hi, ol, method="encode_memory"))
        self._tpos = jax.jit(lambda v, p: self.net.apply(v, p, method="tpos_ptr"))
        self.reset()

    def reset(self):
        self.frames = None
        self.cond: dict[int, dict] = {}
        self.non_cond: dict[int, dict] = {}
        self._enc_cache: dict[int, dict] = {}

    def init_state(self, frames):
        self.reset()
        self.frames = list(frames)
        return self

    # -- internals ---------------------------------------------------------------
    def _enc(self, fidx: int):
        if fidx not in self._enc_cache:
            self._enc_cache[fidx] = self.sam._encode(
                self.variables, self.sam._preprocess(self.frames[fidx]))
            if len(self._enc_cache) > 8:  # bounded feature cache
                old = min(k for k in self._enc_cache if k != fidx)
                self._enc_cache.pop(old)
        return self._enc_cache[fidx]

    def _assemble_memory(self, fidx: int):
        """Select memories + object pointers (sam.py:620-783, r=1 path)."""
        import jax.numpy as jnp

        P = self.variables["params"]
        mems, poss = [], []
        items = [(0, self.cond[t]) for t in sorted(self.cond)]
        for t_pos in range(1, self.num_maskmem):
            t_rel = self.num_maskmem - t_pos
            prev = fidx - t_rel
            out = self.non_cond.get(prev) or self.cond.get(prev)
            if out is None or t_pos == 0:
                continue
            items.append((t_pos, out))
        for t_pos, out in items:
            mems.append(out["maskmem"].reshape(1, -1, 64))
            tpos = np.asarray(P["maskmem_tpos_enc"])[self.num_maskmem - t_pos - 1, 0]
            poss.append(out["maskmem_pos"].reshape(1, -1, 64) + tpos)
        # object pointers: past cond frames + up to max_obj_ptrs-1 prev frames
        ptrs, tdiffs = [], []
        for t in sorted(self.cond):
            if t <= fidx:
                ptrs.append(self.cond[t]["obj_ptr"])
                tdiffs.append(fidx - t)
        for td in range(1, self.max_obj_ptrs):
            t = fidx - td
            if t < 0:
                break
            out = self.non_cond.get(t)
            if out is not None and t not in self.cond:
                ptrs.append(out["obj_ptr"])
                tdiffs.append(td)
        n_ptr_tokens = 0
        if ptrs:
            pt = np.stack(ptrs, 1)  # (1, n, 256)
            n = pt.shape[1]
            tok = pt.reshape(1, n * 4, 64)
            tp = self._tpos(self.variables,
                            jnp.asarray(np.asarray(tdiffs, np.float32) / (self.max_obj_ptrs - 1)))
            tp = np.repeat(np.asarray(tp), 4, axis=0)[None]
            mems.append(tok)
            poss.append(tp)
            n_ptr_tokens = n * 4
        memory = np.concatenate(mems, 1)
        mpos = np.concatenate(poss, 1)
        return memory, mpos, n_ptr_tokens

    def _step(self, fidx: int, points=None, labels=None, is_cond: bool = False):
        import jax.numpy as jnp

        enc = self._enc(fidx)
        P = self.variables["params"]
        if is_cond or not (self.cond or self.non_cond):
            feat = enc["feat"] + P["no_mem_embed"][0, 0]
        else:
            memory, mpos, nptr = self._assemble_memory(fidx)
            feat = self._condition(self.variables, enc["feat"], enc["pos"],
                                   jnp.asarray(memory), jnp.asarray(mpos), nptr)
        S = self.sam.img_size
        h, w = self.frames[fidx].shape[:2]
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.float32))
            p = (p * [S / w, S / h] + 0.5) / S
            l = np.asarray(labels if labels is not None else np.ones(len(p)), np.int32)
            heads = self._heads_multi
        else:
            p = np.zeros((1, 2), np.float32)
            l = -np.ones((1,), np.int32)
            heads = self._heads_single
        out = heads(self.variables, feat, jnp.asarray(p[None]), jnp.asarray(l[None]),
                    enc["feat_s0"], enc["feat_s1"])
        low_multi, ious, low_res, hi, obj_ptr, obj_logits = out
        if points is not None:
            best = int(np.argmax(np.asarray(ious[0])))
            low = np.asarray(low_multi[0, best])[None, None]
            score = float(np.asarray(ious[0, best]))
        else:
            low = np.asarray(low_res)
            score = float(np.asarray(ious[0, 0]))
        hi_nhwc = jnp.transpose(hi, (0, 2, 3, 1))
        mem, mem_pos = self._encode_mem(self.variables, enc["feat"], hi_nhwc,
                                        obj_logits)
        rec = {"maskmem": np.asarray(mem), "maskmem_pos": np.asarray(mem_pos),
               "obj_ptr": np.asarray(obj_ptr), "low_res": low, "score": score,
               "obj_logits": float(np.asarray(obj_logits[0]))}
        (self.cond if is_cond else self.non_cond)[fidx] = rec
        return rec

    # -- public API ---------------------------------------------------------------
    def add_points(self, frame_idx: int, points, labels=None):
        """Register a conditioning frame with point prompts."""
        rec = self._step(frame_idx, points=points, labels=labels, is_cond=True)
        return self._mask_at(frame_idx, rec), rec["score"]

    def _mask_at(self, fidx: int, rec):
        import jax.image as jimg
        import jax.numpy as jnp

        h, w = self.frames[fidx].shape[:2]
        m = jimg.resize(jnp.asarray(rec["low_res"][0, 0]), (h, w), method="bilinear")
        return np.asarray(m > 0.0)

    def propagate(self, start: int | None = None):
        """Track the prompted object through the video; yields
        (frame_idx, mask bool (H, W), score)."""
        assert self.cond, "add_points() on at least one frame first"
        first = min(self.cond)
        start = first if start is None else start
        for fidx in range(start, len(self.frames)):
            if fidx in self.cond:
                rec = self.cond[fidx]
            else:
                rec = self._step(fidx)
            yield fidx, self._mask_at(fidx, rec), rec["score"]
