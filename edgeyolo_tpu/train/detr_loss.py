"""RT-DETR training criterion: bipartite matching + varifocal/L1/GIoU losses.

Behavioral spec: ultralytics/models/utils/loss.py (RTDETRDetectionLoss,
HungarianMatcher with cost gains class/bbox/giou = 2/5/2, loss gains
cls 1 / bbox 5 / giou 2, aux losses per decoder layer) and
models/utils/ops.py get_cdn_group (contrastive denoising, implemented below
as make_cdn_group and wired into the trainer's RT-DETR path).

TPU-first matcher: the reference runs scipy's Hungarian on host per image;
here matching is a fixed-iteration parallel auction (Bertsekas) entirely
inside jit — all gts bid simultaneously, conflicts resolve by max bid, and
with eps-scaling the result is eps-optimal (exact for separated costs).
M <= max_gt rows vs nq columns, so a few dozen sweeps converge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from edgeyolo_tpu.ops.boxes import bbox_iou, xywh2xyxy, xyxy2xywh
from edgeyolo_tpu.train.loss import bce_logits


def make_cdn_group(gt_cls, gt_boxes, mask_gt, nc: int, key, num_dn: int = 100,
                   cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0):
    """Build one contrastive-denoising query group set with static shapes.

    Behavioral spec: reference models/utils/ops.py:259-345 (get_cdn_group) —
    2*num_group copies of the padded gt set; positives get small box noise
    (rand in [0,1)), negatives get known-bad noise (rand in [1,2)); labels
    flip to a random class with prob cls_noise_ratio/2. Group count derives
    from num_dn // max_gt, so with the dense padded-gt layout every shape is
    static and the whole generator jits.

    Returns a dict consumable by RTDETRDecoder(dn=...) and the dn loss:
    cls (B,D) int32, bbox (B,D,4) cxcywh in [0,1], valid (B,D), neg (D,)
    bool numpy, group_size/num_groups python ints.
    """
    gt_cls = gt_cls.reshape(gt_cls.shape[0], -1).astype(jnp.int32)
    B, M = gt_cls.shape
    g = max(1, num_dn // max(M, 1))
    D = 2 * g * M
    neg_np = np.tile(np.concatenate([np.zeros(M, bool), np.ones(M, bool)]), g)  # (D,)

    reps = 2 * g
    cls_t = jnp.tile(gt_cls, (1, reps))                       # (B, D)
    box_t = jnp.tile(gt_boxes, (1, reps, 1))                  # (B, D, 4)
    valid = jnp.tile(mask_gt.reshape(B, M) > 0, (1, reps))    # (B, D)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    flip = (jax.random.uniform(k1, (B, D)) < cls_noise_ratio * 0.5) & valid
    rnd_cls = jax.random.randint(k2, (B, D), 0, nc)
    dn_cls = jnp.where(flip, rnd_cls, cls_t)

    wh = box_t[..., 2:]
    diff = jnp.concatenate([wh * 0.5, wh], axis=-1)           # (B, D, 4)
    sign = jnp.where(jax.random.bernoulli(k3, 0.5, (B, D, 4)), 1.0, -1.0)
    rand_part = jax.random.uniform(k4, (B, D, 4))
    rand_part = rand_part + jnp.asarray(neg_np, jnp.float32)[None, :, None]
    xyxy = xywh2xyxy(box_t) + sign * rand_part * diff * box_noise_scale
    xyxy = jnp.clip(xyxy, 0.0, 1.0)
    # per-coordinate noise can invert corners; re-sort so boxes stay valid
    lo = jnp.minimum(xyxy[..., :2], xyxy[..., 2:])
    hi = jnp.maximum(xyxy[..., :2], xyxy[..., 2:])
    dn_bbox = xyxy2xywh(jnp.concatenate([lo, hi], axis=-1))
    dn_bbox = jnp.where(valid[..., None], dn_bbox, 0.5)       # keep inert slots sane

    return {"cls": jnp.clip(dn_cls, 0, nc - 1), "bbox": dn_bbox,
            "valid": valid.astype(jnp.float32), "neg": neg_np,
            "group_size": 2 * M, "num_groups": g}


def _giou_xywh(a, b):
    return bbox_iou(a, b, xywh=True, GIoU=True)[..., 0]


@partial(jax.jit, static_argnames=("iters",))
def auction_assign(cost: jnp.ndarray, row_mask: jnp.ndarray, iters: int = 64):
    """eps-optimal assignment of rows (gts) to columns (queries).

    cost: (M, N) — lower is better; row_mask: (M,) valid rows.
    Returns col_of_row (M,) int32 (-1 for invalid rows).
    """
    M, N = cost.shape
    value = -cost  # auction maximizes
    eps = (jnp.max(jnp.abs(value)) + 1.0) / (N * 4.0) + 1e-6

    def body(state, _):
        prices, owner = state  # prices (N,), owner (N,) int32 row index or -1
        # current column of each row (-1 if unassigned)
        has = owner[None, :] == jnp.arange(M)[:, None]  # (M,N)
        assigned = jnp.any(has, axis=1)
        net = value - prices[None, :]  # (M,N)
        best_val = jnp.max(net, axis=1)
        best_col = jnp.argmax(net, axis=1)
        net2 = jnp.where(jax.nn.one_hot(best_col, N, dtype=bool), -jnp.inf, net)
        second_val = jnp.max(net2, axis=1)
        bid = best_val - second_val + eps  # (M,)
        bidding = row_mask & ~assigned
        # highest bidder per column
        bid_matrix = jnp.where(
            bidding[:, None] & jax.nn.one_hot(best_col, N, dtype=bool), bid[:, None], -jnp.inf
        )  # (M,N)
        top_bid = jnp.max(bid_matrix, axis=0)  # (N,)
        top_row = jnp.argmax(bid_matrix, axis=0)
        won = top_bid > -jnp.inf
        new_prices = jnp.where(won, prices + top_bid, prices)
        new_owner = jnp.where(won, top_row, owner)
        return (new_prices, new_owner), None

    init = (jnp.zeros(N), jnp.full((N,), -1, jnp.int32))
    (prices, owner), _ = jax.lax.scan(body, init, None, length=iters)
    col_of_row = jnp.argmax(owner[None, :] == jnp.arange(M)[:, None], axis=1)
    got = jnp.any(owner[None, :] == jnp.arange(M)[:, None], axis=1)
    return jnp.where(row_mask & got, col_of_row, -1)


class RTDETRDetectionLoss:
    """Varifocal + L1 + GIoU over auction-matched query-gt pairs, summed over
    the final layer, decoder aux layers and the encoder proposals."""

    def __init__(self, model=None, nc=80, cls_gain=1.0, bbox_gain=5.0, giou_gain=2.0,
                 cost_class=2.0, cost_bbox=5.0, cost_giou=2.0):
        if model is not None:
            nc = model.nc
        self.nc = nc
        self.g = (cls_gain, bbox_gain, giou_gain)
        self.c = (cost_class, cost_bbox, cost_giou)

    def match_cost(self, sc, bb, gc, gb, mg):
        """One image's matcher cost matrix (M, nq), masked rows at 1e6.

        This IS the matrix `_single_layer` assigns over (it calls this) —
        exposed so the fixed-iteration auction can be audited against an
        exact Hungarian solver on real training matrices
        (tools/parity_run.py rtdetr branch; reference matcher:
        models/utils/loss.py:357 HungarianMatcher with gains 2/5/2)."""
        nc = sc.shape[-1]
        cc, cb, cg = self.c
        prob = jax.nn.sigmoid(sc)  # (nq, nc)
        cls_cost = -prob[:, jnp.clip(gc, 0, nc - 1)]  # (nq, M)
        l1 = jnp.sum(jnp.abs(bb[:, None, :] - gb[None, :, :]), axis=-1)  # (nq, M)
        giou = _giou_xywh(bb[:, None, :], gb[None, :, :])  # (nq, M)
        cost = (cc * cls_cost + cb * l1 + cg * (1 - giou)).T  # (M, nq)
        return jnp.where(mg[:, None] > 0, cost, 1e6)

    def _single_layer(self, scores, bboxes, gt_cls, gt_boxes, mask_gt):
        """scores (B, nq, nc) logits; bboxes (B, nq, 4) normalized cxcywh;
        gt_boxes (B, M, 4) normalized cxcywh."""
        B, nq, nc = scores.shape
        M = gt_boxes.shape[1]

        def per_image(sc, bb, gc, gb, mg):
            cost = self.match_cost(sc, bb, gc, gb, mg)
            col = auction_assign(cost, mg > 0)  # (M,)
            matched = col >= 0
            colc = jnp.clip(col, 0, nq - 1)

            # classification target: one-hot at matched queries, IoU-weighted (VFL)
            pred_at = bb[colc]  # (M,4)
            iou_m = jnp.clip(bbox_iou(pred_at, gb, xywh=True)[..., 0], 0, 1) * matched
            tgt = jnp.zeros((nq, nc))
            onehot = jax.nn.one_hot(colc, nq) * matched[:, None]  # (M, nq)
            cls_onehot = jax.nn.one_hot(jnp.clip(gc, 0, nc - 1), nc)  # (M, nc)
            tgt = jnp.einsum("mq,mc->qc", onehot * iou_m[:, None], cls_onehot)
            pos_mask = jnp.einsum("mq,mc->qc", onehot, cls_onehot) > 0
            # varifocal: pos weighted by target IoU, neg by alpha*p^gamma
            p = jax.nn.sigmoid(sc)
            w = jnp.where(pos_mask, tgt, 0.75 * p**2.0)
            loss_cls = jnp.sum(bce_logits(sc, tgt) * w) / jnp.maximum(matched.sum(), 1)

            lb = jnp.sum(jnp.abs(pred_at - gb), axis=-1) * matched
            lg = (1 - _giou_xywh(pred_at, gb)) * matched
            denom = jnp.maximum(matched.sum(), 1)
            return loss_cls, jnp.sum(lb) / denom, jnp.sum(lg) / denom

        lc, lb, lg = jax.vmap(per_image)(scores, bboxes, gt_cls, gt_boxes, mask_gt)
        gc_, gb_, gg_ = self.g
        return gc_ * lc.mean() + gb_ * lb.mean() + gg_ * lg.mean(), {
            "cls": lc.mean(), "l1": lb.mean(), "giou": lg.mean()}

    def _dn_layer(self, scores, bboxes, dn, gt_cls, gt_boxes, mask_gt):
        """Denoising losses: matching is by construction (slot i targets the
        gt it was noised from); negatives are pure background cls terms."""
        B, D, nc = scores.shape
        M = gt_boxes.shape[1]
        reps = D // M
        tgt_cls = jnp.tile(gt_cls.reshape(B, M), (1, reps))
        tgt_box = jnp.tile(gt_boxes, (1, reps, 1))
        valid = dn["valid"] > 0
        pos = valid & ~jnp.asarray(dn["neg"])[None, :]

        iou = jnp.clip(bbox_iou(bboxes, tgt_box, xywh=True)[..., 0], 0, 1) * pos
        onehot = jax.nn.one_hot(jnp.clip(tgt_cls, 0, nc - 1), nc)
        tgt = onehot * iou[..., None]
        pos_mask = onehot * pos[..., None] > 0
        p = jax.nn.sigmoid(scores)
        w = jnp.where(pos_mask, tgt, 0.75 * p**2.0)
        denom = jnp.maximum(pos.sum(axis=1), 1)[:, None, None]
        lc = jnp.sum(bce_logits(scores, tgt) * w / denom, axis=(1, 2))

        lb = jnp.sum(jnp.sum(jnp.abs(bboxes - tgt_box), -1) * pos / denom[..., 0], axis=1)
        lg = jnp.sum((1 - _giou_xywh(bboxes, tgt_box)) * pos / denom[..., 0], axis=1)
        gc_, gb_, gg_ = self.g
        return gc_ * lc.mean() + gb_ * lb.mean() + gg_ * lg.mean()

    def __call__(self, out: dict, batch: dict):
        gt_cls = batch["cls"].astype(jnp.int32)
        gt_boxes = batch["bboxes"]  # normalized cxcywh
        mask_gt = batch.get("mask_gt", (jnp.sum(gt_boxes, -1) > 0).astype(jnp.float32))

        dec_b, dec_s = out["feats"]  # final layer
        total, items = self._single_layer(dec_s, dec_b, gt_cls, gt_boxes, mask_gt)
        aux_b, aux_s = out.get("aux", ([], []))
        for ab, asc in zip(aux_b[:-1], aux_s[:-1]):  # aux layers (final already counted)
            l, _ = self._single_layer(asc, ab, gt_cls, gt_boxes, mask_gt)
            total = total + l
        if "enc_scores" in out:
            l, _ = self._single_layer(out["enc_scores"], out["enc_bboxes"], gt_cls, gt_boxes, mask_gt)
            total = total + l
        dn = batch.get("dn")
        if dn is not None and "dn_feats" in out:
            db, ds = out["dn_feats"]
            dn_total = self._dn_layer(ds, db, dn, gt_cls, gt_boxes, mask_gt)
            dab, das = out.get("dn_aux", ([], []))
            for ab, asc in zip(dab[:-1], das[:-1]):
                dn_total = dn_total + self._dn_layer(asc, ab, dn, gt_cls, gt_boxes, mask_gt)
            total = total + dn_total
            items = {**items, "dn": jax.lax.stop_gradient(dn_total)}
        B = gt_boxes.shape[0]
        return total * B, {k: jax.lax.stop_gradient(v) for k, v in items.items()}
