"""Fully on-device, fixed-shape, class-aware NMS.

Replaces torchvision.ops.nms (reference NATIVE-DEP, ultralytics/utils/ops.py:167-316)
with a TPU-friendly design:

1. candidate gating at `conf_thres` (masked, not filtered — static shapes);
2. multi-label expansion over (anchor, class) pairs exactly like the reference
   (`multi_label` path, ops.py:264-287);
3. top-`max_nms` pre-NMS selection by score (the reference sorts and truncates
   to 30k);
4. the class-offset trick (boxes shifted by class * max_wh) turning class-aware
   NMS into one agnostic pass (ops.py:288);
5. suppression, two methods: `method="scan"` is exact greedy suppression as a
   `lax.scan` over `max_det` steps (pick the highest unsuppressed box, mask
   everything with IoU > `iou_thres` against it — torchvision's sequential
   semantics); `method="matrix"` (the default) computes the same greedy fixed
   point iteratively on the full IoU matrix — it converges to identical keep
   sets in a handful of sweeps and is much faster on TPU, so it is the
   production path; the scan is kept as the oracle for tests.

Output is a fixed (max_det, 6) [x1,y1,x2,y2,conf,cls] tensor padded with
zero-conf rows, plus a validity count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.ops.boxes import xywh2xyxy


def _iou_1_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against (N,4)."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a1 + a2 - inter + 1e-7)


def _greedy_nms_scan(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, max_det: int):
    """Sequential greedy NMS (scan over max_det picks). Exact torchvision
    semantics, but latency-bound on TPU: ~max_det dependent steps."""

    def step(carry, _):
        alive_scores = carry
        idx = jnp.argmax(alive_scores)
        best = alive_scores[idx]
        valid = best > 0.0
        iou = _iou_1_vs_all(boxes[idx], boxes)
        suppress = (iou > iou_thres) | (jnp.arange(boxes.shape[0]) == idx)
        new_scores = jnp.where(valid & suppress, 0.0, alive_scores)
        return new_scores, (idx, valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(step, scores, None, length=max_det)
    return keep_idx, keep_valid


def _greedy_nms_matrix(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float, max_det: int):
    """Parallel greedy NMS via IoU-matrix fixed point.

    Candidates MUST be sorted by score descending. Computes the (N, N) IoU
    matrix once (MXU-friendly) and iterates
        alive_i <- not exists j < i : alive_j and iou[j, i] > thres
    with a while_loop until stable. The fixed point IS the greedy solution
    (induction over rank), reached in as many sweeps as the longest
    suppression chain — single-digit in practice vs max_det sequential picks.
    """
    n = boxes.shape[0]
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-7)
    higher = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]  # j suppresses i if j<i
    sup_edge = higher & (iou > iou_thres)  # (j, i): j can suppress i

    valid0 = scores > 0.0

    # after k sweeps the first k score-ranks are final, so n sweeps always
    # reach the greedy fixed point — the bound is a backstop, not a truncation
    # (real scenes converge in single digits and exit on `changed`)
    def cond(state):
        alive, changed, it = state
        return changed & (it < n)

    def body(state):
        alive, _, it = state
        suppressed = jnp.any(sup_edge & alive[:, None], axis=0)
        new_alive = valid0 & ~suppressed
        return new_alive, jnp.any(new_alive != alive), it + 1

    alive, _, _ = jax.lax.while_loop(cond, body, (valid0, jnp.asarray(True), 0))
    kept_scores = jnp.where(alive, scores, 0.0)
    top_scores, keep_idx = jax.lax.top_k(kept_scores, min(max_det, n))
    return keep_idx, top_scores > 0.0


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "max_wh",
                     "multi_label", "agnostic", "nc", "method", "return_idx",
                     "classes"),
)
def non_max_suppression(
    pred: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 4096,
    max_wh: float = 7680.0,
    multi_label: bool = False,
    agnostic: bool = False,
    nc: int | None = None,
    method: str = "matrix",  # "matrix" (parallel fixed point) | "scan" (sequential)
    return_idx: bool = False,
    classes=None,
):
    """Batched class-aware NMS.

    pred: (B, A, 4+nc) with xywh boxes in pixels and per-class scores.
    classes: optional static sequence of class ids to keep — all other class
    scores are zeroed before the conf gate (reference ops.py:254
    `x[(x[:, 5:6] == classes).any(1)]`, here as a trace-time mask so shapes
    stay fixed). Returns (dets (B, max_det, 6) xyxy/conf/cls, n_valid (B,)),
    plus the kept anchor indices (B, max_det) when return_idx (for gathering
    per-anchor extras like mask coefficients or keypoints downstream).
    """
    b, a, no = pred.shape
    nc = nc or (no - 4)
    boxes_xywh, cls_scores = pred[..., :4], pred[..., 4 : 4 + nc]
    if classes is not None:
        keep = np.zeros((nc,), np.float32)
        keep[np.asarray(list(classes), np.int64)] = 1.0
        cls_scores = cls_scores * jnp.asarray(keep, cls_scores.dtype)
    boxes = xywh2xyxy(boxes_xywh)  # (B,A,4)

    def per_image(bx, sc):
        if multi_label and nc > 1:
            flat = sc.reshape(-1)  # (A*nc,)
            n_cand = min(max_nms, flat.shape[0])
            top_sc, top_ix = jax.lax.top_k(flat, n_cand)
            anchor_ix = top_ix // nc
            cls_ix = (top_ix % nc).astype(jnp.float32)
            cand_boxes = bx[anchor_ix]
            cand_sc = jnp.where(top_sc > conf_thres, top_sc, 0.0)
        else:
            best = jnp.max(sc, axis=-1)
            cls_ix_all = jnp.argmax(sc, axis=-1).astype(jnp.float32)
            n_cand = min(max_nms, a)
            top_sc, anchor_ix = jax.lax.top_k(best, n_cand)
            cand_boxes = bx[anchor_ix]
            cls_ix = cls_ix_all[anchor_ix]
            cand_sc = jnp.where(top_sc > conf_thres, top_sc, 0.0)

        offset = jnp.zeros_like(cls_ix) if agnostic else cls_ix * max_wh
        shifted = cand_boxes + offset[:, None]
        nms_fn = _greedy_nms_matrix if method == "matrix" else _greedy_nms_scan
        keep_idx, keep_valid = nms_fn(shifted, cand_sc, iou_thres, max_det)
        out_boxes = cand_boxes[keep_idx]
        out_conf = cand_sc[keep_idx] * keep_valid
        out_cls = cls_ix[keep_idx]
        det = jnp.concatenate(
            [out_boxes, out_conf[:, None], out_cls[:, None]], axis=-1
        )
        det = jnp.where(keep_valid[:, None], det, 0.0)
        out_anchor = jnp.where(keep_valid, anchor_ix[keep_idx], 0).astype(jnp.int32)
        return det, keep_valid.sum().astype(jnp.int32), out_anchor

    det, n, aidx = jax.vmap(per_image)(boxes, cls_scores)
    if return_idx:
        return det, n, aidx
    return det, n


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "classes",
                                   "multi_label"))
def nms_rotated(pred: jnp.ndarray, conf_thres: float = 0.25, iou_thres: float = 0.45,
                max_det: int = 300, max_nms: int = 2048, classes=None,
                multi_label: bool = False):
    """Batched rotated NMS via probiou suppression.

    pred: (B, A, 4+nc+1) — xywh (rotated extents), class probs, angle (rad).
    Mirrors the reference's rotated path EXACTLY (ops.py:146-165 nms_rotated
    via non_max_suppression rotated=True): candidates sorted by score, then a
    SINGLE-PASS upper-triangle suppression — a box is dropped when ANY
    higher-scored same-class box overlaps it above iou_thres, even if that
    box was itself dropped. (This differs from the axis-aligned path, where
    torchvision's greedy semantics are reproduced by the fixed-point sweep —
    the reference deliberately uses the cheaper matrix rule for rotated
    boxes.) The reference separates classes by the max_wh center-offset
    trick; the same_cls mask here is equivalent (probiou of boxes offset by
    7680px is 0). multi_label=True expands candidates to every
    (anchor, class) pair above conf_thres, the reference validator's setting
    (val multi_label=True at conf 0.001); False keeps the argmax class per
    anchor (predict path). classes: optional static class id filter (see
    non_max_suppression). Returns
    (dets (B, max_det, 7) [cx, cy, w, h, angle, conf, cls], n_valid (B,)).
    """
    from edgeyolo_tpu.ops.boxes import probiou

    b, a, no = pred.shape
    nc = no - 5
    boxes = pred[..., :4]
    scores = pred[..., 4 : 4 + nc]
    if classes is not None:
        keep = np.zeros((nc,), np.float32)
        keep[np.asarray(list(classes), np.int64)] = 1.0
        scores = scores * jnp.asarray(keep, scores.dtype)
    angle = pred[..., -1:]

    def per_image(bx, sc, ang):
        if multi_label:
            # every (anchor, class) pair is a candidate (reference ops.py:279
            # `(cls > conf_thres).nonzero`), ranked by its own class score
            flat = sc.reshape(-1)  # (A*nc,)
            n_cand = min(max_nms, flat.shape[0])
            top_sc, top_fi = jax.lax.top_k(flat, n_cand)
            top_ix = top_fi // nc
            cls_ix = (top_fi % nc).astype(jnp.float32)
        else:
            best = jnp.max(sc, axis=-1)
            n_cand = min(max_nms, a)
            top_sc, top_ix = jax.lax.top_k(best, n_cand)
            cls_ix = jnp.argmax(sc, axis=-1).astype(jnp.float32)[top_ix]
        cand = jnp.concatenate([bx[top_ix], ang[top_ix]], axis=-1)  # (n,5) xywhr
        cand_sc = jnp.where(top_sc > conf_thres, top_sc, 0.0)

        iou = probiou(cand[:, None, :], cand[None, :, :])[..., 0]  # (n,n)
        same_cls = cls_ix[:, None] == cls_ix[None, :]
        higher = jnp.arange(n_cand)[:, None] < jnp.arange(n_cand)[None, :]
        # single-pass matrix rule: suppressed by any higher-ranked same-class
        # candidate (reference `ious.triu_(1).max(dim=0) < threshold`)
        suppressed = jnp.any(higher & (iou > iou_thres) & same_cls, axis=0)
        kept = jnp.where((cand_sc > 0.0) & ~suppressed, cand_sc, 0.0)
        ksc, kidx = jax.lax.top_k(kept, min(max_det, n_cand))
        det = jnp.concatenate(
            [cand[kidx], ksc[:, None], cls_ix[kidx][:, None]], axis=-1
        )
        det = jnp.where((ksc > 0)[:, None], det, 0.0)
        return det, (ksc > 0).sum().astype(jnp.int32)

    return jax.vmap(per_image)(boxes, scores, angle)
