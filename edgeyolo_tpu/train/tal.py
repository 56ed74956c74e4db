"""Task-Aligned Assigner — dense, fixed-shape, jit-safe.

Behavioral spec: ultralytics/utils/tal.py:14-295. The reference uses masked
scatters and a CUDA-OOM CPU fallback; here everything is dense masked algebra
over the static (B, max_gt, A) lattice — the shape TPUs want (SURVEY.md §7
notes the reference already pads GT, so TAL is TPU-friendly by construction).

Semantics preserved exactly:
  align = score^alpha * CIoU^beta over (anchor-center-in-gt ∧ valid-gt);
  top-10 anchors per gt; anchor claimed by multiple gts -> max-CIoU gt wins;
  target scores = one-hot * per-gt normalization (align/max_align)*max_IoU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from edgeyolo_tpu.ops.boxes import bbox_iou


def _topk_mask(align, k: int):
    """0/1 mask of the k largest entries along the last axis, via k fused
    argmax+mask passes — ~8x faster than sort-based lax.top_k at TAL shapes
    on TPU and selection-identical (lowest index wins ties in both)."""
    x = align
    iota = jax.lax.broadcasted_iota(jnp.int32, align.shape, align.ndim - 1)
    mask = jnp.zeros(align.shape, jnp.float32)
    for _ in range(k):
        hit = iota == jnp.argmax(x, axis=-1, keepdims=True)
        mask = mask + hit
        x = jnp.where(hit, -jnp.inf, x)
    return mask


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "eps"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,   # (B, A, nc) sigmoid probabilities
    pd_bboxes: jnp.ndarray,   # (B, A, 4) xyxy, image units
    anc_points: jnp.ndarray,  # (A, 2) image units
    gt_labels: jnp.ndarray,   # (B, M) int
    gt_bboxes: jnp.ndarray,   # (B, M, 4) xyxy, image units
    mask_gt: jnp.ndarray,     # (B, M) 1.0 for real gts
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_labels (B,A), target_bboxes (B,A,4), target_scores
    (B,A,nc), fg_mask (B,A) bool, target_gt_idx (B,A))."""
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(jnp.float32)[..., None]  # (B,M,1)

    # --- candidates: anchor centers strictly inside each gt box -------------
    lt = gt_bboxes[:, :, None, :2]  # (B,M,1,2)
    rb = gt_bboxes[:, :, None, 2:]  # (B,M,1,2)
    deltas = jnp.concatenate([anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1)
    mask_in_gts = (jnp.min(deltas, axis=-1) > eps).astype(jnp.float32)  # (B,M,A)

    gate = mask_in_gts * mask_gt_f  # (B,M,A)

    # --- alignment metric ----------------------------------------------------
    labels = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    # score of each anchor for its gt's class: (B,A,nc) -> (B,M,A)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1
    ) * gate
    ious = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True)
    overlaps = jnp.clip(jnp.squeeze(ious, -1), 0.0, None) * gate  # (B,M,A)
    align = jnp.power(bbox_scores, alpha) * jnp.power(overlaps, beta)

    # --- top-k anchors per gt -------------------------------------------------
    # iterative argmax+mask instead of lax.top_k: the sort-based top_k is
    # 17 ms at b128 vs 2 ms for k max-reduction passes (tools/profile_loss.py,
    # PERF.md §training). Selection is identical incl. tie order (both pick
    # the lowest index first).
    k = min(topk, A)
    mask_topk = _topk_mask(align, k)
    mask_topk = mask_topk * mask_gt_f
    mask_topk = jnp.where(mask_topk > 1, 0.0, mask_topk)  # mirror dup filter
    mask_pos = mask_topk * mask_in_gts * mask_gt_f  # (B,M,A)

    # --- resolve anchors claimed by multiple gts: max-overlap wins ----------
    fg_counts = jnp.sum(mask_pos, axis=1)  # (B,A)
    multi = (fg_counts[:, None, :] > 1.0)
    max_idx = jnp.argmax(overlaps, axis=1)  # (B,A)
    is_max = jax.nn.one_hot(max_idx, M, dtype=jnp.float32).transpose(0, 2, 1)  # (B,M,A)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=1) > 0  # (B,A) bool
    target_gt_idx = jnp.argmax(mask_pos, axis=1)  # (B,A)

    # --- gather targets -------------------------------------------------------
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)  # (B,A)
    target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)  # (B,A,4)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=jnp.float32)
    target_scores = target_scores * fg_mask[..., None]

    # --- per-gt normalization -------------------------------------------------
    align_pos = align * mask_pos
    pos_align = jnp.max(align_pos, axis=-1, keepdims=True)  # (B,M,1)
    pos_overlap = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)  # (B,M,1)
    norm = jnp.max(align_pos * pos_overlap / (pos_align + eps), axis=1)  # (B,A)
    target_scores = target_scores * norm[..., None]

    return target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "eps"))
def rotated_task_aligned_assign(
    pd_scores, pd_rboxes, anc_points, gt_labels, gt_rboxes, mask_gt,
    topk: int = 10, num_classes: int = 80, alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9,
):
    """Rotated variant (reference tal.py:298-330): probiou overlap + anchor
    center inside the rotated gt rect. Boxes are xywhr (radians).
    Returns the same 5-tuple as task_aligned_assign."""
    from edgeyolo_tpu.ops.boxes import probiou

    B, A, nc = pd_scores.shape
    M = gt_rboxes.shape[1]
    mask_gt_f = mask_gt.astype(jnp.float32)[..., None]

    # --- anchor center in rotated rect -------------------------------------
    cx, cy = gt_rboxes[..., 0:1], gt_rboxes[..., 1:2]  # (B,M,1)
    w, h, r = gt_rboxes[..., 2:3], gt_rboxes[..., 3:4], gt_rboxes[..., 4:5]
    dx = anc_points[None, None, :, 0] - cx  # (B,M,A)
    dy = anc_points[None, None, :, 1] - cy
    cos, sin = jnp.cos(r), jnp.sin(r)
    lx = dx * cos + dy * sin  # rotate into box frame
    ly = -dx * sin + dy * cos
    mask_in = ((jnp.abs(lx) < w / 2) & (jnp.abs(ly) < h / 2)).astype(jnp.float32)
    gate = mask_in * mask_gt_f

    labels = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    bbox_scores = jnp.take_along_axis(pd_scores.transpose(0, 2, 1), labels[:, :, None], axis=1) * gate
    overlaps = jnp.clip(
        probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :])[..., 0], 0.0, None
    ) * gate
    align = jnp.power(bbox_scores, alpha) * jnp.power(overlaps, beta)

    k = min(topk, A)
    mask_topk = _topk_mask(align, k) * mask_gt_f
    mask_topk = jnp.where(mask_topk > 1, 0.0, mask_topk)
    mask_pos = mask_topk * mask_in * mask_gt_f

    fg_counts = jnp.sum(mask_pos, axis=1)
    multi = fg_counts[:, None, :] > 1.0
    is_max = jax.nn.one_hot(jnp.argmax(overlaps, axis=1), M, dtype=jnp.float32).transpose(0, 2, 1)
    mask_pos = jnp.where(multi, is_max, mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=1) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=1)

    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_rboxes = jnp.take_along_axis(gt_rboxes, target_gt_idx[..., None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=jnp.float32) * fg_mask[..., None]

    align_pos = align * mask_pos
    pos_align = jnp.max(align_pos, axis=-1, keepdims=True)
    pos_overlap = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(align_pos * pos_overlap / (pos_align + eps), axis=1)
    target_scores = target_scores * norm[..., None]
    return target_labels, target_rboxes, target_scores, fg_mask, target_gt_idx
