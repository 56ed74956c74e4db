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

from typing import Sequence

import jax
import jax.numpy as jnp

from edgeyolo_tpu.nn.modules.block import dfl_decode
from edgeyolo_tpu.ops.boxes import bbox2dist, bbox_iou, crop_mask, dist2bbox, make_anchors, xywh2xyxy
from edgeyolo_tpu.train.tal import task_aligned_assign


def _hyp_get(hyp, key: str, default: float) -> float:
    """Gain lookup honoring explicit zeros (a user setting box/cls/dfl to 0.0
    disables that term; `or`-chaining would silently restore the default)."""
    if hyp is None:
        return float(default)
    v = hyp.get(key, default) if isinstance(hyp, dict) else getattr(hyp, key, default)
    return float(default if v is None else v)


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
    # gather-free: take_along_axis over the (B,A,4,R) logp was 135 ms/b128 on
    # TPU (dynamic gather runs on the scatter unit); an iota-compare weight
    # mask fuses into the log_softmax and reduces in one pass (PERF.md
    # §training, tools/profile_loss.py)
    bins = jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
    w = (wl[..., None] * (bins == tl[..., None])
         + wr[..., None] * (bins == jnp.clip(tr, 0, reg_max - 1)[..., None]))
    return jnp.mean(-jnp.sum(logp * w, axis=-1), axis=-1)


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
            reg_max = int(getattr(model, "reg_max", reg_max))  # reference v8DetectionLoss reads m.reg_max
        self.nc = nc
        self.reg_max = reg_max
        self.stride = tuple(stride)
        self.tal_topk = tal_topk
        self.box_gain = _hyp_get(hyp, "box", 7.5)
        self.cls_gain = _hyp_get(hyp, "cls", 0.5)
        self.dfl_gain = _hyp_get(hyp, "dfl", 1.5)

    def _prepare(self, feats: Sequence[jnp.ndarray], batch: dict) -> dict:
        """Shared geometry + TAL assignment, computed ONCE per step — the
        detection terms and the seg/pose extra terms both consume this (the
        assigner is the most expensive loss component; subclasses used to
        recompute it)."""
        nc, reg_max = self.nc, self.reg_max
        no = nc + 4 * reg_max
        B = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
        pred_dist, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]

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

        _, target_bboxes, target_scores, fg_mask, target_gt_idx = task_aligned_assign(
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

        # optional (B,) per-image weight: 1 for real samples, 0 for the padded
        # duplicates a fixed-shape final batch carries (dataset._collate) —
        # zeroing here removes their gradient contribution entirely
        wimg = batch.get("img_weight")
        if wimg is not None:
            target_scores = target_scores * wimg[:, None, None]

        return {
            "B": B, "A": flat.shape[1], "img_h": img_h, "img_w": img_w,
            "pred_dist": pred_dist, "pred_scores": pred_scores,
            "anchor_points": anchor_points, "stride_tensor": stride_tensor,
            "pred_bboxes": pred_bboxes,
            "target_bboxes": target_bboxes, "target_scores": target_scores,
            "fg_mask": fg_mask, "target_gt_idx": target_gt_idx,
            "target_scores_sum": jnp.maximum(jnp.sum(target_scores), 1.0),
            "img_weight": wimg,
        }

    def __call__(self, feats: Sequence[jnp.ndarray], batch: dict, quality: Sequence[jnp.ndarray] | None = None):
        """feats: per-level (B,H,W,4*reg_max+nc) NHWC maps. Returns
        (total_loss scalar, dict of detached components)."""
        return self._det_terms(self._prepare(feats, batch), quality)

    def _det_terms(self, prep: dict, quality: Sequence[jnp.ndarray] | None = None):
        nc, reg_max = self.nc, self.reg_max
        B, A = prep["B"], prep["A"]
        pred_dist, pred_scores = prep["pred_dist"], prep["pred_scores"]
        anchor_points, stride_tensor = prep["anchor_points"], prep["stride_tensor"]
        pred_bboxes = prep["pred_bboxes"]
        target_bboxes, target_scores = prep["target_bboxes"], prep["target_scores"]
        fg_mask = prep["fg_mask"]
        target_scores_sum = prep["target_scores_sum"]
        wimg = prep.get("img_weight")
        # padded duplicates contribute no cls negatives either
        wb = wimg[:, None, None] if wimg is not None else 1.0

        # --- classification: quality-joint BCE when the head emits qualities ---
        if quality is not None:
            q = jnp.concatenate([qi.reshape(B, -1, 1) for qi in quality], axis=1)  # (B,A,1)
            j = jnp.clip(jax.nn.sigmoid(pred_scores) * q, 1e-6, 1 - 1e-6)
            j_logits = jnp.log(j / (1 - j))
            loss_cls = jnp.sum(bce_logits(j_logits, target_scores) * wb) / target_scores_sum
        else:
            loss_cls = jnp.sum(bce_logits(pred_scores, target_scores) * wb) / target_scores_sum

        # --- box: CIoU weighted by target score, DFL to ltrb bins --------------
        fg = fg_mask.astype(jnp.float32)  # (B,A)
        weight = jnp.sum(target_scores, axis=-1) * fg  # (B,A)
        tb_grid = target_bboxes / stride_tensor[None]  # grid units
        # zero-gt images put degenerate (0,0,0,0) targets on every anchor;
        # CIoU's arctan(w/h) is 0/0 = NaN there and multiply-masking cannot
        # stop it (0 x NaN = NaN). The reference never sees them (fg boolean
        # indexing, loss.py:244); dense formulation needs a safe dummy +
        # where-mask. Identical bits for every real-target anchor.
        dummy = jnp.asarray([0.0, 0.0, 1.0, 1.0], jnp.float32)
        safe_tb = jnp.where(fg[..., None] > 0, tb_grid, dummy)
        iou = bbox_iou(pred_bboxes, safe_tb, xywh=False, CIoU=True)[..., 0]  # (B,A)
        loss_iou = jnp.sum(jnp.where(fg > 0, (1.0 - iou) * weight, 0.0)) / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], tb_grid, reg_max - 1)  # (B,A,4)
        dl = df_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)  # (B,A)
        loss_dfl = jnp.sum(dl * weight) / target_scores_sum

        loss_box = loss_iou * self.box_gain
        loss_cls = loss_cls * self.cls_gain
        loss_dfl = loss_dfl * self.dfl_gain
        # reference total is loss.sum() * batch_size of the ACTUAL batch; with
        # padding that is the real-image count
        n_img = jnp.sum(wimg) if wimg is not None else B
        total = (loss_box + loss_cls + loss_dfl) * n_img
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


class SegmentationLoss(DetectionLoss):
    """Detection loss + per-positive-anchor mask BCE.

    Behavioral spec: ultralytics/utils/loss.py:423-569 — pred mask =
    proto . coefs, cropped to the target box, BCE against the downsampled gt
    instance mask, normalized by box area; fixed-shape variant works on padded
    (B, M, h, w) instance masks and the dense (B, A) assignment.
    """

    def __call__(self, out: dict | Sequence, batch: dict, quality=None):
        if not isinstance(out, dict):
            return super().__call__(out, batch, quality)
        feats, mc, proto = out["feats"], out["mask_coefs"], out["proto"]
        prep = self._prepare(feats, batch)
        total, items = self._det_terms(prep, out.get("quality"))
        masks = batch.get("masks")  # (B, M, mh, mw) float 0/1
        if masks is None:
            return total, items

        B = prep["B"]
        img_h, img_w = prep["img_h"], prep["img_w"]
        target_bboxes, fg_mask = prep["target_bboxes"], prep["fg_mask"]
        target_gt_idx = prep["target_gt_idx"]

        # per-anchor target mask and box (normalized to proto grid)
        tgt_masks = jnp.take_along_axis(masks, target_gt_idx[:, :, None, None], axis=1)  # (B,A,mh,mw)
        # pred masks: proto (B,ph,pw,nm) @ coefs (B,A,nm) -> (B,A,ph,pw)
        pm_logits = jnp.einsum("bhwn,ban->bahw", proto, mc)
        # target masks expected at proto resolution (dataset downsamples)
        xyxyn = target_bboxes / jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        box_p = xyxyn * jnp.asarray([pm_logits.shape[3], pm_logits.shape[2]] * 2, jnp.float32)
        area = jnp.clip((xyxyn[..., 2] - xyxyn[..., 0]) * (xyxyn[..., 3] - xyxyn[..., 1]), 1e-3, None)

        bce = bce_logits(pm_logits, tgt_masks)  # (B,A,ph,pw)
        Bsz, A = fg_mask.shape
        cropped = crop_mask(bce.reshape(Bsz * A, *bce.shape[2:]), box_p.reshape(Bsz * A, 4))
        per_anchor = cropped.reshape(Bsz, A, -1).mean(-1) / area  # (B,A)
        w = fg_mask.astype(jnp.float32)
        wimg = prep.get("img_weight")
        if wimg is not None:
            w = w * wimg[:, None]
        # reference normalizes the mask term by the POSITIVE COUNT
        # (calculate_segmentation_loss returns loss / fg_mask.sum(),
        # loss.py:570), not target_scores_sum
        loss_seg = jnp.sum(per_anchor * w) / jnp.maximum(jnp.sum(w), 1.0) * self.box_gain
        items = dict(items)
        items["seg"] = jax.lax.stop_gradient(loss_seg)
        n_img = jnp.sum(wimg) if wimg is not None else B
        return total + loss_seg * n_img, items


class PoseLoss(DetectionLoss):
    """Detection loss + OKS keypoint location + visibility BCE.

    Behavioral spec: ultralytics/utils/loss.py:572-706 — kpt decoded as
    raw*2 + (anchor - 0.5), Euclidean OKS-weighted location loss on visible
    keypoints, BCE on the visibility channel.
    """

    # COCO 17-kpt sigmas
    SIGMAS = jnp.asarray([
        0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
        0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
    ])

    def __init__(self, *a, kpt_shape=(17, 3), pose_gain=12.0, kobj_gain=1.0, **kw):
        super().__init__(*a, **kw)
        self.kpt_shape = tuple(kpt_shape)
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain

    def __call__(self, out: dict | Sequence, batch: dict, quality=None):
        if not isinstance(out, dict):
            return super().__call__(out, batch, quality)
        feats, kpts_raw = out["feats"], out["kpts_raw"]
        prep = self._prepare(feats, batch)
        total, items = self._det_terms(prep, out.get("quality"))
        gt_kpts = batch.get("keypoints")  # (B, M, K, 3) pixel coords + vis
        if gt_kpts is None:
            return total, items

        B = prep["B"]
        K, D = self.kpt_shape
        anchor_points, stride_tensor = prep["anchor_points"], prep["stride_tensor"]
        target_bboxes, fg_mask = prep["target_bboxes"], prep["fg_mask"]
        target_gt_idx = prep["target_gt_idx"]

        A = kpts_raw.shape[1]
        y = kpts_raw.reshape(B, A, K, D)
        # decode to pixels: (raw*2 + anchor - 0.5) * stride
        pk_xy = (y[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_tensor[None, :, None, :]
        tgt_k = jnp.take_along_axis(gt_kpts, target_gt_idx[:, :, None, None], axis=1)  # (B,A,K,3)
        vis = (tgt_k[..., 2] > 0).astype(jnp.float32)  # (B,A,K)
        area = jnp.clip(
            (target_bboxes[..., 2] - target_bboxes[..., 0]) * (target_bboxes[..., 3] - target_bboxes[..., 1]),
            1e-3, None,
        )[..., None]
        d2 = jnp.sum((pk_xy - tgt_k[..., :2]) ** 2, axis=-1)  # (B,A,K)
        sigmas = self.SIGMAS[: K] if K == 17 else jnp.full((K,), 1.0 / K)
        e = d2 / ((2 * sigmas[None, None]) ** 2) / (area + 1e-9) / 2
        kpt_loss = (1 - jnp.exp(-e)) * vis  # OKS-style
        w = fg_mask.astype(jnp.float32)[..., None]
        wimg = prep.get("img_weight")
        if wimg is not None:
            w = w * wimg[:, None, None]
        loss_kpt = jnp.sum(kpt_loss * w) / jnp.maximum(jnp.sum(vis * w), 1.0) * self.pose_gain
        loss_kobj = 0.0
        if D == 3:
            kobj = bce_logits(y[..., 2], vis)
            loss_kobj = jnp.sum(kobj * w.squeeze(-1)[..., None]) / jnp.maximum(jnp.sum(w) * K, 1.0) * self.kobj_gain
        items = dict(items)
        items["kpt"] = jax.lax.stop_gradient(loss_kpt)
        n_img = jnp.sum(wimg) if wimg is not None else B
        total = total + (loss_kpt + loss_kobj) * n_img
        return total, items


class OBBLoss(DetectionLoss):
    """Rotated-box criterion: probiou box loss + rotated TAL assignment.

    Behavioral spec: ultralytics/utils/loss.py:720-832 (v8OBBLoss) —
    rotated assigner, 1 - probiou box term, DFL on ltrb of the rotated decode.
    Targets: batch["bboxes"] (B,M,5) normalized xywh + angle rad.
    """

    def __call__(self, out: dict | Sequence, batch: dict, quality=None):
        from edgeyolo_tpu.ops.boxes import dist2rbox, probiou
        from edgeyolo_tpu.train.tal import rotated_task_aligned_assign

        feats, angle = out["feats"], out["angle"]  # angle (B,A,1) radians
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

        gt_cls = batch["cls"].astype(jnp.int32)
        gtb = batch["bboxes"]  # (B,M,5) normalized xywh + r
        scale = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        gt_rboxes = jnp.concatenate([gtb[..., :4] * scale, gtb[..., 4:5]], axis=-1)
        mask_gt = batch.get("mask_gt", (jnp.sum(gtb[..., :4], -1) > 0).astype(jnp.float32))

        dist = dfl_decode(pred_dist, reg_max)
        pred_rboxes_g = jnp.concatenate(
            [dist2rbox(dist, angle, anchor_points[None]), angle], axis=-1
        )  # grid units + angle
        pred_rboxes = jnp.concatenate(
            [pred_rboxes_g[..., :4] * stride_tensor[None], angle], axis=-1
        )

        _, target_rboxes, target_scores, fg_mask, _ = rotated_task_aligned_assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_rboxes),
            anchor_points * stride_tensor,
            gt_cls, gt_rboxes, mask_gt,
            topk=self.tal_topk, num_classes=nc,
        )
        wimg = batch.get("img_weight")  # (B,) 1 real / 0 padded duplicate
        if wimg is not None:
            target_scores = target_scores * wimg[:, None, None]
        target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)
        wb = wimg[:, None, None] if wimg is not None else 1.0
        loss_cls = jnp.sum(bce_logits(pred_scores, target_scores) * wb) / target_scores_sum

        fg = fg_mask.astype(jnp.float32)
        weight = jnp.sum(target_scores, axis=-1) * fg
        tb_grid = jnp.concatenate(
            [target_rboxes[..., :4] / stride_tensor[None], target_rboxes[..., 4:5]], axis=-1
        )
        # degenerate (padded, w=h=0) targets reach probiou on non-fg anchors
        # in this dense formulation — the reference only evaluates the fg
        # subset (loss.py:784 boolean indexing). sqrt(det)' is infinite at 0,
        # and 0-weight x inf-grad = NaN, so substitute a unit dummy box and
        # where-mask the sum (multiply-masking does NOT stop the NaN).
        dummy = jnp.asarray([0.0, 0.0, 1.0, 1.0, 0.0], jnp.float32)
        safe_tb = jnp.where(fg[..., None] > 0, tb_grid, dummy)
        iou = probiou(pred_rboxes_g, safe_tb)[..., 0]
        loss_iou = jnp.sum(jnp.where(fg > 0, (1.0 - iou) * weight, 0.0)) / target_scores_sum

        # DFL on the axis-aligned ltrb of the rotated target (reference
        # converts xywhr->xyxy of the unrotated extent for dist targets)
        txy, twh = tb_grid[..., :2], tb_grid[..., 2:4]
        tb_xyxy = jnp.concatenate([txy - twh / 2, txy + twh / 2], axis=-1)
        target_ltrb = bbox2dist(anchor_points[None], tb_xyxy, reg_max - 1)
        dl = df_loss(pred_dist.reshape(B, A, 4, reg_max), target_ltrb, reg_max)
        loss_dfl = jnp.sum(dl * weight) / target_scores_sum

        loss_box = loss_iou * self.box_gain
        loss_cls = loss_cls * self.cls_gain
        loss_dfl = loss_dfl * self.dfl_gain
        n_img = jnp.sum(wimg) if wimg is not None else B
        total = (loss_box + loss_cls + loss_dfl) * n_img
        return total, {"box": jax.lax.stop_gradient(loss_box),
                       "cls": jax.lax.stop_gradient(loss_cls),
                       "dfl": jax.lax.stop_gradient(loss_dfl)}


class ClassificationLoss:
    """Plain softmax cross-entropy (reference loss.py:709-717)."""

    def __call__(self, logits, batch):
        labels = batch["cls"].astype(jnp.int32).reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll_i = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]  # (B,)
        wimg = batch.get("img_weight")
        if wimg is not None:  # exclude padded duplicates from the mean
            nll = jnp.sum(nll_i * wimg) / jnp.maximum(jnp.sum(wimg), 1.0)
        else:
            nll = nll_i.mean()
        return nll, {"cls": jax.lax.stop_gradient(nll)}
