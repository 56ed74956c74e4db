"""YOLO-World open-vocabulary blocks: text-guided attention + contrastive heads.

Behavioral spec: ultralytics/nn/modules/block.py (MaxSigmoidAttnBlock:~530,
C2fAttn:579, ImagePoolingAttn:606, ContrastiveHead:652, BNContrastiveHead:670)
and head.py WorldDetect:479. Text embeddings arrive as a (B, K, gc) side
input threaded through the graph (WorldModel.set_classes supplies them; CLIP
text encoding itself is gated — no pretrained weights in this offline image,
any embedding source of the right width works).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from edgeyolo_tpu.nn.modules.block import Bottleneck, dfl_decode
from edgeyolo_tpu.nn.modules.conv import bn_eps, bn_momentum, KERNEL_INIT, ConvBN
from edgeyolo_tpu.nn.modules.head import Detect, _bias_const


class MaxSigmoidAttnBlock(nn.Module):
    """Text-max sigmoid gating over spatial features."""

    c1: int
    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, _ = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, kernel_init=KERNEL_INIT, name="gl")(guide)  # (B,K,ec)
        g = g.reshape(b, -1, self.nh, self.ec // self.nh)
        embed = ConvBN(self.ec, 1, act=False, name="ec")(x, train) if self.c1 != self.ec else x
        embed = embed.reshape(b, h, w, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed, g)
        aw = jnp.max(aw, axis=-1) / (hc**0.5)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias[None, None, None, :])
        if self.scale:
            aw = aw * self.param("scale", nn.initializers.ones, (self.nh,))[None, None, None, :]
        y = ConvBN(self.c2, 3, act=False, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw[..., None]
        return y.reshape(b, h, w, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention branch appended before fusion."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, bb = jnp.split(y, 2, axis=-1)
        ys = [a, bb]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, c, self.nh, self.ec, self.gc, name="attn")(ys[-1], guide, train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class ImagePoolingAttn(nn.Module):
    """Enhance text embeddings with pooled multi-scale image context."""

    ec: int = 256
    ch: Sequence[int] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        bs = xs[0].shape[0]
        patches = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"projections_{i}")(x)
            b, h, w, c = p.shape
            # adaptive max pool to (k, k) with torch bin boundaries
            # floor(i*h/k)..ceil((i+1)*h/k) — exact for any h, incl. h < k
            import math as _math

            rows = []
            for bi in range(self.k):
                y0, y1 = (bi * h) // self.k, _math.ceil((bi + 1) * h / self.k)
                cols = []
                for bj in range(self.k):
                    x0, x1 = (bj * w) // self.k, _math.ceil((bj + 1) * w / self.k)
                    cols.append(p[:, y0:y1, x0:x1].max(axis=(1, 2)))
                rows.append(jnp.stack(cols, axis=1))
            p = jnp.stack(rows, axis=1)  # (b, k, k, c)
            patches.append(p.reshape(b, self.k * self.k, c))
        kv = jnp.concatenate(patches, axis=1)  # (B, nf*k^2, ec)

        # names mirror the reference's Sequential(LayerNorm, Linear) indices
        # (ultralytics nn/modules/block.py ImagePoolingAttn: query/key/value.0/.1)
        q = nn.Dense(self.ec, kernel_init=KERNEL_INIT, name="query_1")(nn.LayerNorm(name="query_0")(text))
        kk = nn.Dense(self.ec, kernel_init=KERNEL_INIT, name="key_1")(nn.LayerNorm(name="key_0")(kv))
        vv = nn.Dense(self.ec, kernel_init=KERNEL_INIT, name="value_1")(nn.LayerNorm(name="value_0")(kv))
        hc = self.ec // self.nh
        qh = q.reshape(bs, -1, self.nh, hc)
        kh = kk.reshape(bs, -1, self.nh, hc)
        vh = vv.reshape(bs, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", qh, kh) / (hc**0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, vh).reshape(bs, -1, self.ec)
        out = nn.Dense(self.ct, kernel_init=KERNEL_INIT, name="proj")(out)
        if self.scale:
            out = out * self.param("scale", nn.initializers.zeros, (1,))
        return out + text


class ContrastiveHead(nn.Module):
    """Region-text cosine similarity logits with learned scale + bias."""

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", lambda k: jnp.asarray([-10.0]))
        logit_scale = self.param("logit_scale", lambda k: jnp.log(jnp.asarray(1 / 0.07)))
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", xn, wn)
        return sim * jnp.exp(logit_scale) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of the contrastive head."""

    embed_dims: int

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(), epsilon=bn_eps(),
                         dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        bias = self.param("bias", lambda k: jnp.asarray([-10.0]))
        logit_scale = self.param("logit_scale", lambda k: jnp.asarray(-1.0))
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bhwc,bkc->bhwk", x, wn)
        return sim * jnp.exp(logit_scale) + bias


class WorldDetect(Detect):
    """Detect with text-embedding classification via contrastive similarity."""

    embed: int = 512
    with_bn: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False, text=None):
        assert text is not None, "WorldDetect requires text embeddings (B, K, embed-src)"
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            b = ConvBN(c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        bias_init=_bias_const(1.0), dtype=x.dtype, name=f"cv2_{i}_2")(b)
            e = ConvBN(c3, 3, name=f"cv3_{i}_0")(x, train)
            e = ConvBN(c3, 3, name=f"cv3_{i}_1")(e, train)
            e = nn.Conv(self.embed, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                        dtype=x.dtype, name=f"cv3_{i}_2")(e)
            head = (BNContrastiveHead(self.embed, name=f"cv4_{i}") if self.with_bn
                    else ContrastiveHead(name=f"cv4_{i}"))
            cls = head(e, text, train)  # (B,H,W,K)
            feats.append(jnp.concatenate([b, cls], axis=-1))
        out = {"feats": feats}
        if not train:
            out["pred"] = self.decode_world(feats, text.shape[1])
        return out

    def decode_world(self, feats, k_classes: int):
        from edgeyolo_tpu.ops.boxes import dist2bbox, make_anchors

        b = feats[0].shape[0]
        no = 4 * self.reg_max + k_classes
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        box_logits, cls_logits = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, strides = make_anchors(shapes, self.stride, 0.5)
        dist = dfl_decode(box_logits, self.reg_max)
        dbox = dist2bbox(dist, anchors[None], xywh=True) * strides[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls_logits)], axis=-1)
