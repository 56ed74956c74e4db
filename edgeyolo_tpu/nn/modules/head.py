"""Detection heads: anchor-free Detect and the GFLv2xUniHead quality family.

Behavioral spec (reference ultralytics/nn/modules/head.py):
- Detect:38-189       decoupled reg/cls towers, DFL integral decode, per-level
  channel widths c2=max(16, ch0/4, 4*reg_max), c3=max(ch0, min(nc,100)),
  non-legacy cls tower = DWConv+1x1 pairs, bias priors in bias_init:150.
- GF2Detect:194-345   adds per-level quality mini-head reg_conf over DFL
  distribution statistics (top-4 per side + mean = 20ch -> 64 -> 1 sigmoid),
  multiplies quality into cls probs at inference.
- GFLHeadv2_uniH:827 / GFLHeadv2_E2E:976 are aliases of the intended GFLv2
  behavior (their local inference paths are dead in the reference; the working
  semantics is GF2Detect's — implemented once here, SURVEY.md §2.4).
- Classify:454        conv -> GAP -> dropout -> linear.

Everything stays on device and fixed-shape: the decode emits a padded
(B, A, 4+nc) tensor; NMS lives in ops/nms.py.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from edgeyolo_tpu.nn.modules.block import dfl_decode
from edgeyolo_tpu.nn.modules.conv import bn_eps, bn_momentum, KERNEL_INIT, ConvBN, DWConv
from edgeyolo_tpu.ops.boxes import dist2bbox, make_anchors


def _bias_const(v: float):
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, v, dtype)


def e2e_postprocess(preds, max_det: int, nc: int):
    """NMS-free top-k selection for end2end heads (reference Detect.postprocess,
    head.py:167-189): top max_det anchors by best class score, then a flat
    (anchor x class) top-k for multi-label selection. preds (B, A, 4+nc) with
    xyxy boxes -> (B, max_det, 6) [x1, y1, x2, y2, score, cls], score-sorted."""
    boxes = preds[..., :4]
    scores = preds[..., 4:4 + nc]
    k = min(max_det, scores.shape[1])
    _, ix = jax.lax.top_k(scores.max(-1), k)
    boxes = jnp.take_along_axis(boxes, ix[..., None], axis=1)
    scores = jnp.take_along_axis(scores, ix[..., None], axis=1)
    top, fi = jax.lax.top_k(scores.reshape(scores.shape[0], -1), k)
    bsel = jnp.take_along_axis(boxes, (fi // nc)[..., None], axis=1)
    return jnp.concatenate(
        [bsel, top[..., None], (fi % nc)[..., None].astype(preds.dtype)], axis=-1)


class Detect(nn.Module):
    """Anchor-free decoupled detection head over nl pyramid levels."""

    nc: int = 80
    ch: Sequence[int] = ()
    stride: Sequence[int] = (8, 16, 32)
    reg_max: int = 16
    legacy: bool = False
    end2end: bool = False
    max_det: int = 300

    @property
    def no(self) -> int:
        return self.nc + self.reg_max * 4

    def _towers(self, xs, train, prefix: str = ""):
        """Run reg (cv2) and cls (cv3) towers on each level; returns lists."""
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        cls_bias = lambda s: math.log(5 / self.nc / (640 / s) ** 2)
        boxes, clss = [], []
        for i, x in enumerate(xs):
            b = ConvBN(c2, 3, name=f"{prefix}cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, name=f"{prefix}cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        bias_init=_bias_const(1.0), dtype=x.dtype, name=f"{prefix}cv2_{i}_2")(b)
            if self.legacy:
                c = ConvBN(c3, 3, name=f"{prefix}cv3_{i}_0")(x, train)
                c = ConvBN(c3, 3, name=f"{prefix}cv3_{i}_1")(c, train)
            else:
                c = DWConv(x.shape[-1], 3, name=f"{prefix}cv3_{i}_0_0")(x, train)
                c = ConvBN(c3, 1, name=f"{prefix}cv3_{i}_0_1")(c, train)
                c = DWConv(c3, 3, name=f"{prefix}cv3_{i}_1_0")(c, train)
                c = ConvBN(c3, 1, name=f"{prefix}cv3_{i}_1_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        bias_init=_bias_const(cls_bias(self.stride[i])), dtype=x.dtype,
                        name=f"{prefix}cv3_{i}_2")(c)
            boxes.append(b)
            clss.append(c)
        return boxes, clss

    def decode(self, feats, quality=None):
        """Concatenate levels, DFL-decode boxes to image space, sigmoid cls.

        feats: list of (B, H, W, 4*reg_max + nc). Returns (B, A, 4+nc) with
        xywh boxes in input-image pixels.
        """
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        # decode in f32 regardless of the tower compute dtype: box coords span
        # [0, imgsz] and bf16's 8-bit mantissa would quantize them to ~2 px
        flat = flat.astype(jnp.float32)
        # lax.slice_in_dim, not flat[..., :k]: ellipsis indexing lowers to a
        # dynamic gather under a jax2tf polymorphic batch dim, which the
        # TFLite vhlo legalizer rejects (tflite export path, exporter.py)
        box_logits = jax.lax.slice_in_dim(flat, 0, 4 * self.reg_max, axis=2)
        cls_logits = jax.lax.slice_in_dim(flat, 4 * self.reg_max, flat.shape[-1], axis=2)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, strides = make_anchors(shapes, self.stride, 0.5)
        dist = dfl_decode(box_logits, self.reg_max)
        # end2end decodes straight to xyxy (reference decode_bboxes,
        # head.py:163-165: xywh and (not self.end2end)) and applies the
        # NMS-free top-k selection (head.py:167-189) -> (B, max_det, 6)
        dbox = dist2bbox(dist, anchors[None], xywh=not self.end2end) * strides[None]
        cls_prob = jax.nn.sigmoid(cls_logits)
        if quality is not None:
            q = jnp.concatenate([qi.reshape(b, -1, 1) for qi in quality], axis=1)
            cls_prob = cls_prob * jnp.clip(q, 1e-6, 1 - 1e-6)
        out = jnp.concatenate([dbox, cls_prob], axis=-1)
        if self.end2end:
            out = e2e_postprocess(out, self.max_det, self.nc)
        return out

    @nn.compact
    def __call__(self, xs, train: bool = False):
        boxes, clss = self._towers(xs, train)
        feats = [jnp.concatenate([b, c], axis=-1) for b, c in zip(boxes, clss)]
        out = {"feats": feats}
        if self.end2end:
            xs_d = [jax.lax.stop_gradient(x) for x in xs]
            b1, c1 = self._towers(xs_d, train, prefix="one2one_")
            out["one2one_feats"] = [jnp.concatenate([b, c], axis=-1) for b, c in zip(b1, c1)]
        if not train:
            out["pred"] = self.decode(out.get("one2one_feats", feats))
        return out


class GF2Detect(Detect):
    """Detect + DGQP quality mini-head (the working EdgeLine head).

    Quality input statistic per anchor: for each of the 4 sides, top-k(4)
    softmax probabilities of the DFL distribution plus their mean -> 20
    channels -> 1x1 conv(64) -> ReLU -> 1x1 -> sigmoid -> q in [0,1].
    Training returns per-level qualities for the joint J = sigma(cls)*q loss
    hook (reference utils/loss.py:382-396); inference multiplies q into cls.
    """

    reg_topk: int = 4
    add_mean: bool = True
    reg_channels: int = 64

    @staticmethod
    def _topk_small(x, k: int):
        """top-k values over the small last dim via k unrolled argmax sweeps.

        jax.lax.top_k over a tiny trailing dim of a huge tensor sorts on TPU
        and costs ~50 ms/batch at 640px; k argmax+one-hot sweeps are pure VPU
        ops. Masks exactly ONE occurrence per sweep so duplicate values (e.g.
        a uniform softmax) keep their multiplicity like a real top-k.
        """
        n = x.shape[-1]
        # deterministic tie-break: +iota*1e-7 makes values unique, so the
        # masked-max sweep removes exactly one element per round (duplicates
        # keep their multiplicity up to a <2e-6 perturbation — far below the
        # quality head's resolution) while staying pure VPU ops.
        eps = jnp.arange(n, dtype=x.dtype) * jnp.asarray(1e-7, x.dtype)
        cur = x + eps
        vals = []
        for _ in range(k):
            m = jnp.max(cur, axis=-1, keepdims=True)
            vals.append(m)
            cur = jnp.where(cur == m, -jnp.inf, cur)
        return jnp.concatenate(vals, axis=-1)

    def _quality(self, box_logits, idx: int, prefix: str = ""):
        b, h, w, _ = box_logits.shape
        # f32: the top-k sweep's 1e-7 tie-break is below bf16 resolution, and
        # this mini-head (20->64->1 channels) is negligible traffic anyway
        box_logits = box_logits.astype(jnp.float32)
        prob = jax.nn.softmax(box_logits.reshape(b, h, w, 4, self.reg_max), axis=-1)
        k = min(self.reg_topk, self.reg_max)
        topk = self._topk_small(prob, k)  # (b,h,w,4,k)
        parts = [topk]
        if self.add_mean:
            parts.append(prob.mean(axis=-1, keepdims=True))
        stat = jnp.concatenate(parts, axis=-1).reshape(b, h, w, -1)
        q = nn.Conv(self.reg_channels, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                    dtype=stat.dtype, name=f"{prefix}reg_conf_{idx}_0")(stat)
        q = jax.nn.relu(q)
        q = nn.Conv(1, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                    dtype=stat.dtype, name=f"{prefix}reg_conf_{idx}_1")(q)
        return jax.nn.sigmoid(q)  # (b,h,w,1)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        boxes, clss = self._towers(xs, train)
        quality = [self._quality(b, i) for i, b in enumerate(boxes)]
        feats = [jnp.concatenate([b, c], axis=-1) for b, c in zip(boxes, clss)]
        out = {"feats": feats, "quality": quality}
        if self.end2end:
            xs_d = [jax.lax.stop_gradient(x) for x in xs]
            b1, c1 = self._towers(xs_d, train, prefix="one2one_")
            q1 = [self._quality(bb, i, prefix="one2one_") for i, bb in enumerate(b1)]
            out["one2one_feats"] = [jnp.concatenate([b, c], axis=-1) for b, c in zip(b1, c1)]
            out["one2one_quality"] = q1
        if not train:
            if self.end2end:
                out["pred"] = self.decode(out["one2one_feats"], out["one2one_quality"])
            else:
                out["pred"] = self.decode(feats, quality)
        return out


class E2EDetect(GF2Detect):
    """End-to-end (NMS-free) GF2Detect: one2one branch + top-k postprocess."""

    end2end: bool = True


class GFLHeadv2_uniH(GF2Detect):
    """UniHead-named alias. The reference's extra stem/DAT/posCNN/CiT slots are
    identity placeholders (head.py:832-838) and its local inference is dead
    code; the functional behavior is GF2Detect's (SURVEY.md §2.4)."""


class GFLHeadv2_E2E(E2EDetect):
    """Alias implementing the *intended* Detect+DGQP+E2E behavior (the
    reference class is non-functional as-is; SURVEY.md §2.4)."""


class Classify(nn.Module):
    """Classification head: conv -> GAP -> dropout -> linear -> logits."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        c_ = 1280
        x = ConvBN(c_, self.k, self.s, self.p, self.g, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout_rate > 0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.c2, kernel_init=KERNEL_INIT, name="linear")(x)


class Segment(Detect):
    """Segmentation head: Detect + per-anchor mask coefficients + Proto bank.

    Behavioral spec: head.py:347-371 — proto on the P3 feature, per-level cv4
    towers emitting nm coefficients; inference appends coefficients to the
    decoded predictions so NMS carries them through.
    """

    nm: int = 32
    npr: int = 256

    def _coefs(self, xs, train):
        from edgeyolo_tpu.nn.modules.conv import ConvBN

        c4 = max(self.ch[0] // 4, self.nm)
        out = []
        for i, x in enumerate(xs):
            m = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            m = ConvBN(c4, 3, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"cv4_{i}_2")(m)
            out.append(m.reshape(x.shape[0], -1, self.nm))
        return jnp.concatenate(out, axis=1)  # (B, A, nm)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from edgeyolo_tpu.nn.modules.block import Proto

        proto = Proto(self.npr, self.nm, name="proto")(xs[0], train)  # (B, 4H, 4W? -> H*?, nm)
        mc = self._coefs(xs, train)
        boxes, clss = self._towers(xs, train)
        feats = [jnp.concatenate([b, c], axis=-1) for b, c in zip(boxes, clss)]
        out = {"feats": feats, "mask_coefs": mc, "proto": proto}
        if not train:
            out["pred"] = jnp.concatenate([self.decode(feats), mc], axis=-1)
        return out


class OBB(Detect):
    """Oriented-box head: Detect + per-anchor angle in [-pi/4, 3pi/4].

    Behavioral spec: head.py:372-400 — angle = (sigmoid(t) - 0.25) * pi,
    boxes decoded with the rotated dist2rbox.
    """

    ne: int = 1

    def _angles(self, xs, train):
        from edgeyolo_tpu.nn.modules.conv import ConvBN

        c4 = max(self.ch[0] // 4, self.ne)
        out = []
        for i, x in enumerate(xs):
            a = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            a = ConvBN(c4, 3, name=f"cv4_{i}_1")(a, train)
            a = nn.Conv(self.ne, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"cv4_{i}_2")(a)
            out.append(a.reshape(x.shape[0], -1, self.ne))
        return jnp.concatenate(out, axis=1)  # (B, A, ne)

    def decode_rotated(self, feats, angle):
        from edgeyolo_tpu.nn.modules.block import dfl_decode
        from edgeyolo_tpu.ops.boxes import dist2rbox, make_anchors

        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        # decode in f32 regardless of the tower compute dtype: box coords span
        # [0, imgsz] and bf16's 8-bit mantissa would quantize them to ~2 px
        flat = flat.astype(jnp.float32)
        # lax.slice_in_dim, not flat[..., :k]: ellipsis indexing lowers to a
        # dynamic gather under a jax2tf polymorphic batch dim, which the
        # TFLite vhlo legalizer rejects (tflite export path, exporter.py)
        box_logits = jax.lax.slice_in_dim(flat, 0, 4 * self.reg_max, axis=2)
        cls_logits = jax.lax.slice_in_dim(flat, 4 * self.reg_max, flat.shape[-1], axis=2)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, strides = make_anchors(shapes, self.stride, 0.5)
        dist = dfl_decode(box_logits, self.reg_max)
        rbox = dist2rbox(dist, angle, anchors[None]) * strides[None]
        return jnp.concatenate([rbox, jax.nn.sigmoid(cls_logits)], axis=-1)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        angle_logits = self._angles(xs, train)
        angle = (jax.nn.sigmoid(angle_logits) - 0.25) * math.pi
        boxes, clss = self._towers(xs, train)
        feats = [jnp.concatenate([b, c], axis=-1) for b, c in zip(boxes, clss)]
        out = {"feats": feats, "angle": angle}
        if not train:
            out["pred"] = jnp.concatenate([self.decode_rotated(feats, angle), angle], axis=-1)
        return out


class Pose(Detect):
    """Keypoint head: Detect + per-anchor K x D keypoint regressions.

    Behavioral spec: head.py:402-452 — kpt xy decoded as
    (raw*2 + anchor - 0.5) * stride, visibility sigmoid for D=3.
    """

    kpt_shape: Sequence[int] = (17, 3)

    @property
    def nk(self) -> int:
        return self.kpt_shape[0] * self.kpt_shape[1]

    def _kpts(self, xs, train):
        from edgeyolo_tpu.nn.modules.conv import ConvBN

        c4 = max(self.ch[0] // 4, self.nk)
        out = []
        for i, x in enumerate(xs):
            k = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            k = ConvBN(c4, 3, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(self.nk, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"cv4_{i}_2")(k)
            out.append(k.reshape(x.shape[0], -1, self.nk))
        return jnp.concatenate(out, axis=1)  # (B, A, nk)

    def kpts_decode(self, kpts, shapes):
        from edgeyolo_tpu.ops.boxes import make_anchors

        b, a, _ = kpts.shape
        K, D = self.kpt_shape
        anchors, strides = make_anchors(shapes, self.stride, 0.5)
        y = kpts.reshape(b, a, K, D)
        xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * strides[None, :, None, :]
        if D == 3:
            vis = jax.nn.sigmoid(y[..., 2:3])
            return jnp.concatenate([xy, vis], axis=-1).reshape(b, a, self.nk)
        return xy.reshape(b, a, self.nk)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        kpts = self._kpts(xs, train)
        boxes, clss = self._towers(xs, train)
        feats = [jnp.concatenate([b, c], axis=-1) for b, c in zip(boxes, clss)]
        out = {"feats": feats, "kpts_raw": kpts}
        if not train:
            shapes = [(f.shape[1], f.shape[2]) for f in feats]
            out["pred"] = jnp.concatenate([self.decode(feats), self.kpts_decode(kpts, shapes)], axis=-1)
        return out


class v10Detect(Detect):
    """v10 NMS-free head: the lightweight DW cls tower IS the non-legacy
    Detect tower (reference head.py:764-797), plus the one2one branch."""

    end2end: bool = True


class RTDETRDecoder(nn.Module):
    """RT-DETR query decoder head.

    Behavioral spec: reference head.py:533-761 — per-level 1x1+BN input
    projection, anchor-logit generation over the flattened multi-scale grid,
    top-300 query selection from the encoder score head, 6 deformable decoder
    layers with iterative refinement. Inference returns (B, nq, 4+nc) with
    normalized cxcywh boxes; training additionally exposes encoder/decoder
    aux outputs. Contrastive denoising groups (models/utils/ops.py:259) are
    deferred to the training criterion.
    """

    nc: int = 80
    ch: Sequence[int] = ()
    stride: Sequence[int] = (8, 16, 32)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    learnt_init_query: bool = False

    def _anchors(self, shapes, grid_size: float = 0.05, eps: float = 1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            xy = jnp.stack([gx, gy], -1).reshape(-1, 2)
            wh = jnp.full_like(xy, grid_size * (2.0**i))
            anchors.append(jnp.concatenate([xy, wh], -1))
        a = jnp.concatenate(anchors, 0)[None]  # (1, A, 4)
        valid = jnp.all((a > eps) & (a < 1 - eps), axis=-1, keepdims=True)
        a = jnp.log(a / (1 - a))
        # large-finite instead of inf: sigmoid(1e6)==1.0 exactly in fp32 but
        # inf would poison gradients when a tie-broken top_k picks an
        # invalid anchor (all-equal score maps, e.g. blank frames)
        a = jnp.where(valid, a, 1e6)
        return a, valid

    @nn.compact
    def __call__(self, xs, train: bool = False, dn=None):
        from edgeyolo_tpu.nn.modules.transformer import (
            MLP,
            DeformableTransformerDecoder,
            inverse_sigmoid,
        )

        b = xs[0].shape[0]
        feats_l, shapes = [], []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"input_proj_{i}_conv")(x)
            p = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(), epsilon=bn_eps(),
                             dtype=jnp.float32, name=f"input_proj_{i}_bn")(p)
            h, w = p.shape[1:3]
            feats_l.append(p.reshape(b, h * w, self.hd))
            shapes.append((h, w))
        feats = jnp.concatenate(feats_l, axis=1)  # (B, A, hd)

        anchors, valid = self._anchors(shapes)
        features = nn.Dense(self.hd, kernel_init=KERNEL_INIT, name="enc_output_0")(
            jnp.where(valid, feats, 0.0))
        features = nn.LayerNorm(epsilon=1e-5, name="enc_output_1")(features)
        # constant focal prior bias_init_with_prob(0.01), independent of nc
        # (reference head.py RTDETRDecoder._reset_parameters)
        enc_scores_all = nn.Dense(self.nc, kernel_init=KERNEL_INIT,
                                  bias_init=nn.initializers.constant(
                                      float(-math.log((1 - 0.01) / 0.01))),
                                  name="enc_score_head")(features)

        nq = min(self.nq, feats.shape[1])  # tiny-image safety
        top_val, top_ix = jax.lax.top_k(jnp.max(enc_scores_all, -1), nq)  # (B, nq)
        top_feats = jnp.take_along_axis(features, top_ix[..., None], axis=1)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)),
                                          top_ix[..., None], axis=1)
        refer_logit = MLP(self.hd, 4, 3, name="enc_bbox_head")(top_feats) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_logit)
        enc_scores = jnp.take_along_axis(enc_scores_all, top_ix[..., None], axis=1)

        # contrastive-denoising class embedding (reference models/utils/ops.py:259)
        cdn_embed = self.param("denoising_class_embed", nn.initializers.normal(1.0),
                               (self.nc, self.hd))
        if self.learnt_init_query:
            tgt = self.param("tgt_embed", nn.initializers.xavier_uniform(), (self.nq, self.hd))
            embed = jnp.broadcast_to(tgt[None], (b, self.nq, self.hd))
        else:
            embed = jax.lax.stop_gradient(top_feats) if train else top_feats
        refer = jax.lax.stop_gradient(refer_logit) if train else refer_logit

        # -- contrastive denoising groups (training only) ------------------
        # dn = {"cls": (B,D) int32, "bbox": (B,D,4) normalized cxcywh,
        #       "group_size": python int, "num_groups": python int}; the
        #       attention mask isolates each dn group and hides all dn
        #       queries from the real ones (reference models/utils/ops.py:
        #       316-330: True = blocked).
        attn_mask = None
        D = 0
        if dn is not None:
            import numpy as _np

            dn_embed = cdn_embed[dn["cls"]]  # (B, D, hd)
            dn_refer = inverse_sigmoid(dn["bbox"])
            D = dn_embed.shape[1]
            gs, ng = int(dn["group_size"]), int(dn["num_groups"])
            T = D + nq
            m = _np.zeros((T, T), bool)
            m[D:, :D] = True  # real queries never see dn
            for gi in range(ng):
                a, bnd = gi * gs, (gi + 1) * gs
                m[a:bnd, :a] = True       # dn group blind to earlier dn groups
                m[a:bnd, bnd:D] = True    # ... and later dn groups
            attn_mask = jnp.asarray(m)
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], axis=1)
            refer = jnp.concatenate([dn_refer.astype(refer.dtype), refer], axis=1)

        query_pos_head = MLP(2 * self.hd, self.hd, 2, name="query_pos_head")
        dec_bbox, dec_score, aux_b, aux_s = DeformableTransformerDecoder(
            self.hd, self.ndl, self.nh, self.d_ffn, len(xs), self.ndp, self.nc,
            name="decoder")(embed, refer, feats, shapes, query_pos_head, train,
                            attn_mask=attn_mask)

        if D:
            dn_aux = ([a[:, :D] for a in aux_b], [a[:, :D] for a in aux_s])
            aux_b = [a[:, D:] for a in aux_b]
            aux_s = [a[:, D:] for a in aux_s]
            dn_bbox_out, dn_score_out = dec_bbox[:, :D], dec_score[:, :D]
            dec_bbox, dec_score = dec_bbox[:, D:], dec_score[:, D:]

        out = {
            "feats": [dec_bbox, dec_score],  # placeholder slots for loss plumbing
            "enc_bboxes": enc_bboxes,
            "enc_scores": enc_scores,
            "aux": (aux_b, aux_s),
        }
        if D:
            out["dn_feats"] = [dn_bbox_out, dn_score_out]
            out["dn_aux"] = dn_aux
        if not train:
            # (B, nq, 4+nc): cxcywh normalized + class probs
            out["pred"] = jnp.concatenate([dec_bbox, jax.nn.sigmoid(dec_score)], axis=-1)
        return out
