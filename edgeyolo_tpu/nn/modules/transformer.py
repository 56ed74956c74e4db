"""Transformer modules for RT-DETR: AIFI encoder, multiscale deformable
attention, deformable decoder, RepC3.

Behavioral spec: ultralytics/nn/modules/transformer.py (TransformerEncoderLayer:28,
AIFI:86 with 2D sin-cos embedding, MLP:174, LayerNorm2d:193, MSDeformAttn:218,
DeformableTransformerDecoder(Layer):374/312) and block.py RepC3:~500.

TPU notes: deformable sampling is an explicit batched bilinear gather over the
flattened multi-scale value tensor (the reference's grid_sample); everything
is fixed-shape so the decoder jits once.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from edgeyolo_tpu.nn.modules.conv import KERNEL_INIT, ConvBN


def _mha(q, k, v, num_heads: int, dense, name: str, mask=None):
    """Standard multi-head attention using provided Dense factory.

    mask: optional (nq, nm) bool, True = attention blocked (the CDN
    group-isolation mask, reference models/utils/ops.py:316-330).
    """
    b, nq, c = q.shape
    hd = c // num_heads
    qp = dense(c, f"{name}_q")(q).reshape(b, nq, num_heads, hd)
    kp = dense(c, f"{name}_k")(k).reshape(b, k.shape[1], num_heads, hd)
    vp = dense(c, f"{name}_v")(v).reshape(b, v.shape[1], num_heads, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qp, kp) / math.sqrt(hd)
    if mask is not None:
        attn = jnp.where(mask[None, None], -1e9, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, vp).reshape(b, nq, c)
    return dense(c, f"{name}_o")(out)


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:174)."""

    hidden: int
    out: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, kernel_init=KERNEL_INIT, name=f"l{i}")(x))
        return nn.Dense(self.out, kernel_init=KERNEL_INIT, name=f"l{self.num_layers - 1}")(x)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC maps."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (MHA + FFN)."""

    c1: int
    cm: int = 2048
    num_heads: int = 8

    @nn.compact
    def __call__(self, src, pos=None):
        dense = lambda f, nm: nn.Dense(f, kernel_init=KERNEL_INIT, name=nm)
        q = src if pos is None else src + pos
        attn = _mha(q, q, src, self.num_heads, dense, "ma")
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn)
        ff = dense(self.cm, "fc1")(src)
        ff = dense(self.c1, "fc2")(jax.nn.gelu(ff, approximate=False))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + ff)


class AIFI(nn.Module):
    """Attention-based intra-scale feature interaction on the S32 map."""

    c1: int
    cm: int = 2048
    num_heads: int = 8

    @staticmethod
    def sincos_embed(w: int, h: int, dim: int, temperature: float = 10000.0):
        grid_w = jnp.arange(w, dtype=jnp.float32)
        grid_h = jnp.arange(h, dtype=jnp.float32)
        gw, gh = jnp.meshgrid(grid_w, grid_h, indexing="ij")
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
        out_w = gw.reshape(-1)[:, None] * omega[None]
        out_h = gh.reshape(-1)[:, None] * omega[None]
        return jnp.concatenate(
            [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
        )[None]

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # reference quirk preserved exactly (transformer.py AIFI.forward):
        # tokens are H-major (flatten(2) on BCHW) while the sincos grid is
        # built w-major (meshgrid(w, h, indexing="ij")) — the pairing is
        # "transposed", and matching the reference numerically requires
        # keeping it, not fixing it
        pos = self.sincos_embed(w, h, c)
        tokens = x.reshape(b, h * w, c)
        tokens = TransformerEncoderLayer(self.c1, self.cm, self.num_heads, name="enc")(tokens, pos)
        return tokens.reshape(b, h, w, c)


class RepC3(nn.Module):
    """Rep-style C3 used by the RT-DETR neck."""

    c2: int
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from edgeyolo_tpu.nn.modules.extra import RepConv

        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, name="cv1")(x, train)
        b = ConvBN(c_, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = RepConv(c_, 3, 1, name=f"m_{i}")(a, train)
        y = a + b
        if c_ != self.c2:
            y = ConvBN(self.c2, 1, name="cv3")(y, train)
        return y


def ms_deform_sample(value, value_shapes, sampling_locations, attention_weights):
    """Multi-scale deformable attention core (reference nn/modules/utils.py:42).

    value: (B, Lv, H, D); sampling_locations: (B, Lq, H, L, P, 2) in [0,1];
    attention_weights: (B, Lq, H, L, P). Returns (B, Lq, H*D).
    """
    b, lv, nh, d = value.shape
    _, lq, _, nl, npts, _ = sampling_locations.shape
    out = jnp.zeros((b, lq, nh, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(value_shapes):
        v = value[:, start : start + h * w].reshape(b, h, w, nh, d)
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, H, P, 2) in [0,1]
        xs = loc[..., 0] * w - 0.5
        ys = loc[..., 1] * h - 0.5
        x0 = jnp.floor(xs).astype(jnp.int32)
        y0 = jnp.floor(ys).astype(jnp.int32)
        fx = xs - x0
        fy = ys - y0

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            bidx = jnp.arange(b)[:, None, None, None]
            hidx = jnp.arange(nh)[None, None, :, None]
            g = v[bidx, yi, xi, hidx]  # (B, Lq, H, P, D)
            return g * valid[..., None]

        samp = (tap(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
                + tap(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
                + tap(y0 + 1, x0) * (fy * (1 - fx))[..., None]
                + tap(y0 + 1, x0 + 1) * (fy * fx)[..., None])
        out = out + (samp * attention_weights[:, :, :, lvl, :, None]).sum(axis=3)
        start += h * w
    return out.reshape(b, lq, nh * d)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (Deformable-DETR style)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes):
        b, lq = query.shape[:2]
        lv = value.shape[1]
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // nh

        def offset_bias_init(key, shape, dtype=jnp.float32):
            thetas = jnp.arange(nh, dtype=jnp.float32) * (2.0 * math.pi / nh)
            grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
            grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
            grid = jnp.tile(grid[:, None, None, :], (1, nl, npts, 1))
            scale = jnp.arange(1, npts + 1, dtype=jnp.float32)[None, None, :, None]
            return (grid * scale).reshape(-1)

        v = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                     name="value_proj")(value).reshape(b, lv, nh, d)
        off = nn.Dense(nh * nl * npts * 2, kernel_init=nn.initializers.zeros,
                       bias_init=offset_bias_init, name="sampling_offsets")(query)
        off = off.reshape(b, lq, nh, nl, npts, 2)
        aw = nn.Dense(nh * nl * npts, kernel_init=nn.initializers.zeros,
                      name="attention_weights")(query).reshape(b, lq, nh, nl * npts)
        aw = jax.nn.softmax(aw, axis=-1).reshape(b, lq, nh, nl, npts)

        if refer_bbox.shape[-1] == 2:
            norm = jnp.asarray([[w, h] for (h, w) in value_shapes], jnp.float32)
            loc = refer_bbox[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        else:
            loc = (refer_bbox[:, :, None, None, None, :2]
                   + off / npts * refer_bbox[:, :, None, None, None, 2:] * 0.5)
            loc = jnp.broadcast_to(loc, (b, lq, nh, nl, npts, 2))
        out = ms_deform_sample(v, value_shapes, loc, aw)
        return nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attention + deformable cross-attention + FFN."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos=None, attn_mask=None):
        dense = lambda f, nm: nn.Dense(f, kernel_init=KERNEL_INIT, name=nm)
        q = embed if query_pos is None else embed + query_pos
        sa = _mha(q, q, embed, self.n_heads, dense, "self_attn", mask=attn_mask)
        embed = nn.LayerNorm(epsilon=1e-5, name="norm1")(embed + sa)
        ca = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                          name="cross_attn")(
            embed if query_pos is None else embed + query_pos, refer_bbox, feats, shapes)
        embed = nn.LayerNorm(epsilon=1e-5, name="norm2")(embed + ca)
        ff = dense(self.d_ffn, "linear1")(embed)
        ff = dense(self.d_model, "linear2")(jax.nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(embed + ff)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class DeformableTransformerDecoder(nn.Module):
    """Stack of decoder layers with iterative bbox refinement."""

    hd: int = 256
    ndl: int = 6
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    nc: int = 80
    eval_idx: int = -1

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos_head, train: bool = False,
                 attn_mask=None):
        output = embed
        dec_bboxes = []
        dec_scores = []
        last_refined = None
        refer = jax.nn.sigmoid(refer_bbox)
        eval_i = self.ndl + self.eval_idx if self.eval_idx < 0 else self.eval_idx
        for i in range(self.ndl):
            pos = query_pos_head(refer)
            output = DeformableTransformerDecoderLayer(
                self.hd, self.n_heads, self.d_ffn, self.n_levels, self.n_points,
                name=f"layer_{i}")(output, refer, feats, shapes, pos, attn_mask)
            box_delta = MLP(self.hd, 4, 3, name=f"bbox_head_{i}")(output)
            # constant focal prior bias_init_with_prob(0.01), independent of nc
            score = nn.Dense(self.nc, kernel_init=KERNEL_INIT,
                             bias_init=nn.initializers.constant(
                                 float(-math.log((1 - 0.01) / 0.01))),
                             name=f"score_head_{i}")(output)
            refined = jax.nn.sigmoid(box_delta + inverse_sigmoid(refer))
            dec_bboxes.append(refined)
            dec_scores.append(score)
            if not train and i == eval_i:
                return refined, score, dec_bboxes, dec_scores
            refer = jax.lax.stop_gradient(refined) if train else refined
        return dec_bboxes[-1], dec_scores[-1], dec_bboxes, dec_scores
