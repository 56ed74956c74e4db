"""RT-DETR training criterion: bipartite matching + varifocal/L1/GIoU losses.

Behavioral spec: ultralytics/models/utils/loss.py (RTDETRDetectionLoss,
HungarianMatcher with cost gains class/bbox/giou = 2/5/2, loss gains
cls 1 / bbox 5 / giou 2, aux losses per decoder layer) and
models/utils/ops.py get_cdn_group (contrastive denoising — next round).

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

from edgeyolo_tpu.ops.boxes import bbox_iou, xywh2xyxy
from edgeyolo_tpu.train.loss import bce_logits


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

    def _single_layer(self, scores, bboxes, gt_cls, gt_boxes, mask_gt):
        """scores (B, nq, nc) logits; bboxes (B, nq, 4) normalized cxcywh;
        gt_boxes (B, M, 4) normalized cxcywh."""
        B, nq, nc = scores.shape
        M = gt_boxes.shape[1]
        cc, cb, cg = self.c

        def per_image(sc, bb, gc, gb, mg):
            prob = jax.nn.sigmoid(sc)  # (nq, nc)
            cls_cost = -prob[:, jnp.clip(gc, 0, nc - 1)]  # (nq, M)
            l1 = jnp.sum(jnp.abs(bb[:, None, :] - gb[None, :, :]), axis=-1)  # (nq, M)
            giou = _giou_xywh(bb[:, None, :], gb[None, :, :])  # (nq, M)
            cost = (cc * cls_cost + cb * l1 + cg * (1 - giou)).T  # (M, nq)
            cost = jnp.where(mg[:, None] > 0, cost, 1e6)
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
        B = gt_boxes.shape[0]
        return total * B, {k: jax.lax.stop_gradient(v) for k, v in items.items()}
