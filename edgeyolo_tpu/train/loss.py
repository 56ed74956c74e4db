"""Training criteria: DFL/CIoU box loss, BCE/QFL classification, and the
EdgeLine quality-joint hook.

Behavioral spec: ultralytics/utils/loss.py — quality_focal_loss:22,
DFLoss:200, BboxLoss:227, v8DetectionLoss:293-420 (incl. the fork's
GFLv2 hook: when the head emits qualities, the cls loss is BCE on the joint
J = sigma(cls)*q against TAL target scores, loss.py:382-396), E2EDetectLoss:835.

Pure functions over fixed-shape padded targets — the whole criterion jits
into the train step.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from edgeyolo_tpu.nn.modules.block import dfl_decode
from edgeyolo_tpu.ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors, xywh2xyxy
from edgeyolo_tpu.train.tal import task_aligned_assign


def bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def quality_focal_loss(logits, target, beta: float = 2.0):
    """QFL: BCE modulated by |t - sigma(p)|^beta on positives, sigma(p)^beta on
    negatives (target is the soft IoU-quality label)."""
    p = jax.nn.sigmoid(logits)
    bce = bce_logits(logits, target)
    scale = jnp.where(target > 0, jnp.abs(target - p) ** beta, p**beta)
    return bce * scale


def df_loss(pred_dist, target, reg_max: int = 16):
    """Distribution Focal Loss: two-sided CE to floor/ceil bins, linear weights.

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) in bin units.
    Returns (...,) mean over the 4 sides.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1)


class DetectionLoss:
    """v8-style detection criterion bound to a model's head geometry.

    Call with raw head feats (+ optional per-level qualities) and a padded
    target batch: {"cls": (B,M), "bboxes": (B,M,4) normalized xywh,
    "mask_gt": (B,M)}.
    """

    def __init__(self, model=None, *, nc=None, reg_max=16, stride=(8, 16, 32), hyp=None, tal_topk=10):
        if model is not None:
            nc = model.nc
            stride = model.stride
        self.nc = nc
        self.reg_max = reg_max
        self.stride = tuple(stride)
        self.tal_topk = tal_topk
        hyp = hyp or {}
        self.box_gain = float(getattr(hyp, "box", None) or (hyp.get("box", 7.5) if isinstance(hyp, dict) else 7.5))
        self.cls_gain = float(getattr(hyp, "cls", None) or (hyp.get("cls", 0.5) if isinstance(hyp, dict) else 0.5))
        self.dfl_gain = float(getattr(hyp, "dfl", None) or (hyp.get("dfl", 1.5) if isinstance(hyp, dict) else 1.5))

    def __call__(self, feats: Sequence[jnp.ndarray], batch: dict, quality: Sequence[jnp.ndarray] | None = None):
        """feats: per-level (B,H,W,4*reg_max+nc) NHWC maps. Returns
        (total_loss scalar, dict of detached components)."""
        nc, reg_max = self.nc, self.reg_max
        no = nc + 4 * reg_max
        B = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
        pred_dist, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
        A = flat.shape[1]

        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.stride, 0.5)
        img_h = feats[0].shape[1] * self.stride[0]
        img_w = feats[0].shape[2] * self.stride[0]

        # targets: normalized xywh -> pixel xyxy
        gt_cls = batch["cls"].astype(jnp.int32)  # (B,M)
        scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)  # (B,M,4)
        mask_gt = batch.get("mask_gt")
        if mask_gt is None:
            mask_gt = (jnp.sum(batch["bboxes"], axis=-1) > 0).astype(jnp.float32)

        # decode predictions (grid units)
        dist = dfl_decode(pred_dist, reg_max)  # (B,A,4)
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # grid units

        _, target_bboxes, target_scores, fg_mask, _ = task_aligned_assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_cls,
            gt_bboxes,
            mask_gt,
            topk=self.tal_topk,
            num_classes=nc,
            alpha=0.5,
            beta=6.0,
        )

        target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

        # --- classification: quality-joint BCE when the head emits qualities ---
        if quality is not None:
            q = jnp.concatenate([qi.reshape(B, -1, 1) for qi in quality], axis=1)  # (B,A,1)
            j = jnp.clip(jax.nn.sigmoid(pred_scores) * q, 1e-6, 1 - 1e-6)
            j_logits = jnp.log(j / (1 - j))
            loss_cls = jnp.sum(bce_logits(j_logits, target_scores)) / target_scores_sum
        else:
            loss_cls = jnp.sum(bce_logits(pred_scores, target_scores)) / target_scores_sum

        # --- box: CIoU weighted by target score, DFL to ltrb bins --------------
        fg = fg_mask.astype(jnp.float32)  # (B,A)
        weight = jnp.sum(target_scores, axis=-1) * fg  # (B,A)
        tb_grid = target_bboxes / stride_tensor[None]  # grid units
        iou = bbox_iou(pred_bboxes, tb_grid, xywh=False, CIoU=True)[..., 0]  # (B,A)
        loss_iou = jnp.sum((1.0 - iou) * weight) / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], tb_grid, reg_max - 1)  # (B,A,4)
        dl = df_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)  # (B,A)
        loss_dfl = jnp.sum(dl * weight) / target_scores_sum

        loss_box = loss_iou * self.box_gain
        loss_cls = loss_cls * self.cls_gain
        loss_dfl = loss_dfl * self.dfl_gain
        total = (loss_box + loss_cls + loss_dfl) * B
        items = {
            "box": jax.lax.stop_gradient(loss_box),
            "cls": jax.lax.stop_gradient(loss_cls),
            "dfl": jax.lax.stop_gradient(loss_dfl),
        }
        return total, items


class E2EDetectLoss:
    """one2many (topk=10) + one2one (topk=1) sum (reference loss.py:835-850)."""

    def __init__(self, model=None, **kw):
        self.one2many = DetectionLoss(model, tal_topk=10, **kw)
        self.one2one = DetectionLoss(model, tal_topk=1, **kw)

    def __call__(self, out: dict, batch: dict):
        l1, i1 = self.one2many(out["feats"], batch, out.get("quality"))
        l2, i2 = self.one2one(out["one2one_feats"], batch, out.get("one2one_quality"))
        items = {k: i1[k] + i2[k] for k in i1}
        return l1 + l2, items
