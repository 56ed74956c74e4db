"""Extended model-family blocks: v12 area attention, v13 hypergraph (HyperACE),
v10 (CIB/RepVGGDW), v9 (ELAN/ADown/SPPELAN/Rep), misc (DySample, WTConv2d).

Behavioral spec (reference ultralytics/nn/modules/block.py):
- AAttn:1272 / ABlock:1361 / A2C2f:1411   area-attention R-ELAN stack
- AdaHyperedgeGen:1641 / AdaHGConv:1718 / AdaHGComputation:1769 / C3AH:1813 /
  FuseModule:1856 / HyperACE:1896          YOLOv13 hypergraph correlation
- DownsampleConv:1950 / FullPAD_Tunnel:1983 gated aggregation-distribution
- CIB:941 / C2fCIB:982 / RepVGGDW:879      v10 conditional identity blocks
- RepNCSPELAN4:715 / ELAN1 / AConv / ADown / SPPELAN / CBLinear / CBFuse (v9)
- RepConv (conv.py:196), GhostBottleneck:1399(block), DySample (dysample.py:20)
- WTConv2d (conv.py:408): multi-level wavelet-domain depthwise conv

NHWC / flax; attention einsums target the MXU, fixed-shape everywhere.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edgeyolo_tpu.nn.modules.block import C3, C3k, SPP, Bottleneck, max_pool_same
from edgeyolo_tpu.nn.modules.conv import (bn_eps, bn_momentum, KERNEL_INIT, ConvBN, DSConv,
                                           DWConv, GhostConv)
from edgeyolo_tpu.nn.modules.edgeline import DSC3k, DSBottleneck, DWT2D, _bilinear_resize


def avg_pool_2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


# ---------------------------------------------------------------------------
# v12: area attention (R-ELAN)
# ---------------------------------------------------------------------------
class AAttn(nn.Module):
    """Area attention: full attention computed within `area` horizontal bands.

    Equivalent to splitting the N=H*W tokens into `area` chunks and attending
    within each chunk; positional encoding via a 5x5 depthwise conv on v.
    """

    dim: int
    num_heads: int
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        qk = ConvBN(self.dim * 2, 1, act=False, name="qk")(x, train)
        v = ConvBN(self.dim, 1, act=False, name="v")(x, train)
        pp = ConvBN(self.dim, 5, 1, 2, g=self.dim, act=False, name="pe")(v, train)

        a = self.area if (self.area > 1 and n % self.area == 0) else 1
        qk_t = qk.reshape(b * a, n // a, 2, self.num_heads, hd)
        q, k = qk_t[:, :, 0], qk_t[:, :, 1]  # (b*a, n/a, heads, hd)
        v_t = v.reshape(b * a, n // a, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v_t)
        out = out.reshape(b, h, w, c)
        return ConvBN(self.dim, 1, act=False, name="proj")(out + pp, train)


class ABlock(nn.Module):
    """x = x + AAttn(x); x = x + MLP(x) (conv MLP, ratio 1.2 default)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = ConvBN(hidden, 1, name="mlp_0")(x, train)
        y = ConvBN(self.dim, 1, act=False, name="mlp_1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """R-ELAN: cv1 -> n stages of (2x ABlock | C3k) appended -> cv2, with an
    optional layer-scaled residual (gamma init 0.01)."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        num_heads = max(1, c_ // 32)
        y = [ConvBN(c_, 1, name="cv1")(x, train)]
        for i in range(self.n):
            if self.a2:
                z = ABlock(c_, num_heads, self.mlp_ratio, self.area, name=f"m_{i}_0")(y[-1], train)
                z = ABlock(c_, num_heads, self.mlp_ratio, self.area, name=f"m_{i}_1")(z, train)
            else:
                z = C3k(c_, 2, self.shortcut, self.g, name=f"m_{i}")(y[-1], train)
            y.append(z)
        out = ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, axis=-1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", lambda k: jnp.full((self.c2,), 0.01, jnp.float32))
            return x + gamma * out
        return out


# ---------------------------------------------------------------------------
# v13: adaptive hypergraph correlation
# ---------------------------------------------------------------------------
class AdaHyperedgeGen(nn.Module):
    """Participation matrix A (B, N, E): multi-head similarity between nodes
    and context-conditioned hyperedge prototypes, softmax over nodes."""

    node_dim: int
    num_hyperedges: int
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"

    @nn.compact
    def __call__(self, X, train: bool = False):
        B, N, D = X.shape
        E, H = self.num_hyperedges, self.num_heads
        hd = D // H
        proto_base = self.param("prototype_base", nn.initializers.xavier_uniform(), (E, D))
        if self.context == "mean":
            ctx = jnp.mean(X, axis=1)
        elif self.context == "max":
            ctx = jnp.max(X, axis=1)
        else:
            ctx = jnp.concatenate([jnp.mean(X, axis=1), jnp.max(X, axis=1)], axis=-1)
        offsets = nn.Dense(E * D, kernel_init=KERNEL_INIT, name="context_net")(ctx).reshape(B, E, D)
        protos = proto_base[None] + offsets
        Xp = nn.Dense(D, kernel_init=KERNEL_INIT, name="pre_head_proj")(X)
        Xh = Xp.reshape(B, N, H, hd)
        Ph = protos.reshape(B, E, H, hd)
        logits = jnp.einsum("bnhd,behd->bhne", Xh, Ph) / math.sqrt(hd)
        logits = jnp.mean(logits, axis=1)  # (B,N,E)
        if train and self.dropout > 0:
            logits = nn.Dropout(self.dropout, deterministic=True)(logits)  # inference-style (no rng plumbed)
        return jax.nn.softmax(logits, axis=1)  # softmax over NODES


class AdaHGConv(nn.Module):
    """Two-stage hypergraph message passing with residual."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"

    @nn.compact
    def __call__(self, X, train: bool = False):
        A = AdaHyperedgeGen(self.embed_dim, self.num_hyperedges, self.num_heads,
                            self.dropout, self.context, name="edge_generator")(X, train)
        He = jnp.einsum("bne,bnd->bed", A, X)
        He = jax.nn.gelu(nn.Dense(self.embed_dim, kernel_init=KERNEL_INIT, name="edge_proj_0")(He), approximate=False)
        Xn = jnp.einsum("bne,bed->bnd", A, He)
        Xn = jax.nn.gelu(nn.Dense(self.embed_dim, kernel_init=KERNEL_INIT, name="node_proj_0")(Xn), approximate=False)
        return Xn + X


class AdaHGComputation(nn.Module):
    """4D wrapper: NHWC -> tokens -> AdaHGConv -> NHWC."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 8
    dropout: float = 0.1
    context: str = "both"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = AdaHGConv(self.embed_dim, self.num_hyperedges, self.num_heads,
                           self.dropout, self.context, name="hgnn")(tokens, train)
        return tokens.reshape(b, h, w, c)


class C3AH(nn.Module):
    """CSP split around AdaHGComputation."""

    c2: int
    e: float = 1.0
    num_hyperedges: int = 8
    context: str = "both"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        num_heads = max(1, c_ // 16)
        a = ConvBN(c_, 1, name="cv1")(x, train)
        b = ConvBN(c_, 1, name="cv2")(x, train)
        a = AdaHGComputation(c_, self.num_hyperedges, num_heads, 0.1, self.context, name="m")(a, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class FuseModule(nn.Module):
    """Align 3 scales to the middle resolution (avgpool / nearest-up) + 1x1 fuse."""

    c_in: int
    channel_adjust: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x1 = avg_pool_2x(xs[0])
        x3 = jnp.repeat(jnp.repeat(xs[2], 2, axis=1), 2, axis=2)
        cat = jnp.concatenate([x1, xs[1], x3], axis=-1)
        return ConvBN(self.c_in, 1, name="conv_out")(cat, train)


class HyperACE(nn.Module):
    """YOLOv13 hypergraph correlation enhancement over 3 fused scales."""

    c2: int
    n: int = 1
    num_hyperedges: int = 8
    dsc3k: bool = True
    shortcut: bool = False
    e1: float = 0.5
    e2: float = 1.0
    context: str = "both"
    channel_adjust: bool = True

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c1 = xs[1].shape[-1]
        c = int(self.c2 * self.e1)
        x = FuseModule(c1, self.channel_adjust, name="fuse")(xs, train)
        y = ConvBN(3 * c, 1, name="cv1")(x, train)
        y = list(jnp.split(y, 3, axis=-1))
        out1 = C3AH(c, self.e2, self.num_hyperedges, self.context, name="branch1")(y[1], train)
        out2 = C3AH(c, self.e2, self.num_hyperedges, self.context, name="branch2")(y[1], train)
        for i in range(self.n):
            blk = (DSC3k(c, 2, self.shortcut, 1, 0.5, 3, 7, name=f"m_{i}") if self.dsc3k
                   else DSBottleneck(c, self.shortcut, name=f"m_{i}"))
            y.append(blk(y[-1], train))
        y[1] = out1
        y.append(out2)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, axis=-1), train)


class DownsampleConv(nn.Module):
    """2x avg-pool downsample + optional 1x1 channel doubling."""

    c1: int
    channel_adjust: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = avg_pool_2x(x)
        if self.channel_adjust:
            x = ConvBN(self.c1 * 2, 1, name="channel_adjust")(x, train)
        return x


class FullPAD_Tunnel(nn.Module):
    """Gated fusion: out = x[0] + gate * x[1], gate init 0."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        gate = self.param("gate", nn.initializers.zeros, ())
        return xs[0] + gate * xs[1]


# ---------------------------------------------------------------------------
# v10 family
# ---------------------------------------------------------------------------
class RepVGGDW(nn.Module):
    """Parallel 7x7 + 3x3 depthwise convs, summed, SiLU (re-param at export)."""

    ed: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(self.ed, 7, 1, 3, g=self.ed, act=False, name="conv")(x, train)
        b = ConvBN(self.ed, 3, 1, 1, g=self.ed, act=False, name="conv1")(x, train)
        return jax.nn.silu(a + b)


class CIB(nn.Module):
    """Conditional identity block: dw3 -> pw -> (RepVGGDW|dw3) -> pw -> dw3."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c1, 3, g=c1, name="cv1_0")(x, train)
        y = ConvBN(2 * c_, 1, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, name="cv1_2")(y, train)
        else:
            y = ConvBN(2 * c_, 3, g=2 * c_, name="cv1_2")(y, train)
        y = ConvBN(self.c2, 1, name="cv1_3")(y, train)
        y = ConvBN(self.c2, 3, g=self.c2, name="cv1_4")(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        ys = [a, b]
        for i in range(self.n):
            ys.append(CIB(c, self.shortcut, 1.0, self.lk, name=f"m_{i}")(ys[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


# ---------------------------------------------------------------------------
# v9 family
# ---------------------------------------------------------------------------
class RepConv(nn.Module):
    """Training-time 3x3 + 1x1 parallel convs (+identity BN when c1==c2 and
    bn=True), summed then activated; re-parameterizable at export."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: bool | str = True
    bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from edgeyolo_tpu.nn.modules.conv import _apply_act

        a = ConvBN(self.c2, self.k, self.s, None, self.g, act=False, name="conv1")(x, train)
        b = ConvBN(self.c2, 1, self.s, None, self.g, act=False, name="conv2")(x, train)
        out = a + b
        if self.bn and x.shape[-1] == self.c2 and self.s == 1:
            idn = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(),
                               epsilon=bn_eps(), dtype=jnp.float32, name="bn")(x).astype(x.dtype)
            out = out + idn
        return _apply_act(out, self.act)


class RepNCSP(C3):
    """C3 with RepConv-style bottlenecks (RepNBottleneck, e=1.0 inside)."""

    def make_block(self, c_: int, i: int):
        return RepNBottleneck(c_, self.shortcut, self.g, 1.0, name=f"m_{i}")


class RepNBottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, 3, 1, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, 1, g=self.g, name="cv2")(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class RepNCSPELAN4(nn.Module):
    """v9 GELAN block: split, two RepNCSP+conv chains appended, fuse."""

    c2: int
    c3: int = 0
    c4: int = 0
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3, c4 = self.c3, self.c4
        c = c3 // 2
        y = list(jnp.split(ConvBN(c3, 1, name="cv1")(x, train), 2, axis=-1))
        z = RepNCSP(c4, self.n, name="cv2_0")(y[-1], train)
        y.append(ConvBN(c4, 3, 1, name="cv2_1")(z, train))
        z = RepNCSP(c4, self.n, name="cv3_0")(y[-1], train)
        y.append(ConvBN(c4, 3, 1, name="cv3_1")(z, train))
        return ConvBN(self.c2, 1, name="cv4")(jnp.concatenate(y, axis=-1), train)


class ELAN1(nn.Module):
    """Light ELAN: split + two 3x3 convs appended."""

    c2: int
    c3: int = 0
    c4: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = list(jnp.split(ConvBN(self.c3, 1, name="cv1")(x, train), 2, axis=-1))
        y.append(ConvBN(self.c4, 3, 1, name="cv2")(y[-1], train))
        y.append(ConvBN(self.c4, 3, 1, name="cv3")(y[-1], train))
        return ConvBN(self.c2, 1, name="cv4")(jnp.concatenate(y, axis=-1), train)


class AConv(nn.Module):
    """avgpool2 (stride1 k2) + conv3 s2 downsample."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)])
        return ConvBN(self.c2, 3, 2, 1, name="cv1")(x, train)


class ADown(nn.Module):
    """Dual-path downsample: conv on avgpooled half + maxpool+1x1 on other."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)])
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = ConvBN(c, 3, 2, 1, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = ConvBN(c, 1, 1, 0, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN: 1x1 + three chained maxpools, all appended, fused."""

    c2: int
    c3: int = 0
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [ConvBN(self.c3, 1, name="cv1")(x, train)]
        for _ in range(3):
            y.append(max_pool_same(y[-1], self.k))
        return ConvBN(self.c2, 1, name="cv5")(jnp.concatenate(y, axis=-1), train)


class CBLinear(nn.Module):
    """1x1 conv emitting a tuple of per-branch channel groups."""

    c2s: Sequence[int]
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
                      padding="SAME", use_bias=True, kernel_init=KERNEL_INIT,
                      dtype=x.dtype, name="conv")(x)
        sizes = list(self.c2s)[:-1]
        idx = []
        acc = 0
        for s_ in sizes:
            acc += s_
            idx.append(acc)
        return tuple(jnp.split(out, idx, axis=-1))


class CBFuse(nn.Module):
    """Sum selected per-branch maps, nearest-resized to the last input's size."""

    idx: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        target = xs[-1]
        th, tw = target.shape[1:3]
        acc = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]] if isinstance(x, (tuple, list)) else x
            b, h, w, c = sel.shape
            if (h, w) != (th, tw):
                sel = jax.image.resize(sel, (b, th, tw, c), method="nearest")
            acc = acc + sel
        return acc


class GhostBottleneck(nn.Module):
    """Ghost conv sandwich with DW stride option."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, name="short_dw")(x, train)
            sc = ConvBN(self.c2, 1, 1, act=False, name="short_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else ConvBN(self.c2, 1, act=False, name="short_pw")(x, train)
        return y + sc


class C3Ghost(C3):
    def make_block(self, c_: int, i: int):
        return GhostBottleneck(c_, name=f"m_{i}")


class BottleneckCSP(nn.Module):
    """Classic CSP bottleneck (v5-era)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=KERNEL_INIT, dtype=x.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=KERNEL_INIT, dtype=x.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(), epsilon=bn_eps(),
                         dtype=jnp.float32, name="bn")(y).astype(y.dtype)
        y = jax.nn.silu(y)
        return ConvBN(self.c2, 1, name="cv4")(y, train)


class HGStem(nn.Module):
    """PPHGNet stem: stacked convs with a parallel maxpool concat."""

    cm: int
    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem1")(x, train)
        x2 = ConvBN(self.cm // 2, 2, 1, 0, act="relu", name="stem2a")(
            jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0))), train)
        x2 = ConvBN(self.cm, 2, 1, 0, act="relu", name="stem2b")(
            jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0))), train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)])
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem3")(x, train)
        return ConvBN(self.c2, 1, act="relu", name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNet block: n LightConvs appended, squeeze+excite-style 1x1 fuse."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from edgeyolo_tpu.nn.modules.conv import LightConv

        y = [x]
        for i in range(self.n):
            if self.lightconv:
                y.append(LightConv(self.cm, self.k, name=f"m_{i}")(y[-1], train))
            else:
                y.append(ConvBN(self.cm, self.k, act=self.act, name=f"m_{i}")(y[-1], train))
        z = jnp.concatenate(y, axis=-1)
        z = ConvBN(self.c2 // 2, 1, act=self.act, name="sc")(z, train)
        z = ConvBN(self.c2, 1, act=self.act, name="ec")(z, train)
        return z + x if (self.shortcut and x.shape[-1] == self.c2) else z


class ResNetBlock(nn.Module):
    c2: int
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        y = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, self.s, 1, name="cv2")(y, train)
        y = ConvBN(c3, 1, act=False, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            sc = ConvBN(c3, 1, self.s, act=False, name="shortcut")(x, train)
        else:
            sc = x
        return jax.nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """ResNet stage: stem (first) or n ResNetBlocks."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = ConvBN(self.c2, 7, 2, 3, act="relu", name="stem")(x, train)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResNetBlock(self.c2, self.s, self.e, name="block_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, self.e, name=f"block_{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# Misc custom layers
# ---------------------------------------------------------------------------
class DySample(nn.Module):
    """Dynamic upsampler: learned sub-pixel offsets + bilinear gather
    (reference dysample.py:20-93; grid_sample becomes an explicit gather)."""

    c1: int
    scale: int = 2
    style: str = "lp"
    groups: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.scale
        g = self.groups
        # offsets in pixel units, 0.25-scaled, init ~0 (bias towards identity).
        # Channel layout matches the reference conv exactly: [xy(2)][g][s^2]
        # (dysample.py:57 offset.view(B, 2, -1, H, W)), so converted torch
        # weights land in the right slots.
        off = nn.Conv(2 * g * s * s, (1, 1), use_bias=True,
                      kernel_init=nn.initializers.zeros, dtype=x.dtype, name="offset")(x)
        off = off.reshape(b, h, w, 2, g, s, s) * 0.25  # (..., xy, g, p, q)
        # base grid: output pixel (I,J) samples input at ((I+0.5)/s - 0.5, ...)
        # — algebraically identical to the reference's cell+0.5 grid plus its
        # init_pos subpixel bias and the align_corners=False un-normalization
        oy = (jnp.arange(h * s) + 0.5) / s - 0.5
        ox = (jnp.arange(w * s) + 0.5) / s - 0.5
        gy, gx = jnp.meshgrid(oy, ox, indexing="ij")  # (H', W')
        # distribute subpixels: pixel_shuffle semantics (p = row, q = col)
        off_full = off.transpose(0, 1, 5, 2, 6, 4, 3)  # (b, h, p, w, q, g, xy)
        off_full = off_full.reshape(b, h * s, w * s, g, 2)
        sy = gy[None, :, :, None] + off_full[..., 1]
        sx = gx[None, :, :, None] + off_full[..., 0]
        # bilinear gather per group
        cg = c // g
        xg = x.reshape(b, h, w, g, cg)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        fy = (sy - y0)[..., None]
        fx = (sx - x0)[..., None]

        def tap(yi, xi):
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            bidx = jnp.arange(b)[:, None, None, None]
            gidx = jnp.arange(g)[None, None, None, :]
            return xg[bidx, yi, xi, gidx]  # (b, H', W', g, cg)

        out = (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
               + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)
        return out.reshape(b, h * s, w * s, c)


class _Scale(nn.Module):
    """Learned per-channel scale (reference _ScaleModule, conv.py:450 —
    weight shape (1,C,1,1); ours is the NHWC channel vector)."""

    ch: int
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda _: jnp.full((self.ch,), self.init, jnp.float32))
        return x * w.astype(x.dtype)


class WTConv2d(nn.Module):
    """Wavelet-enhanced depthwise conv (reference conv.py:465-600):
    spatial branch = scaled depthwise k x k; frequency branch = per-level
    [DWT (stride-2 zero-pad k_w//2-1, subband order LL/HL/LH/HH per
    create_2d_wavelet_filter) -> depthwise conv on the 4 stacked sub-bands in
    [C][4] channel order -> 0.1-init scale] with bottom-up inverse-DWT
    residual reconstruction; optional stride = subsampling (AvgPool2d(1,s)).
    Torch weights load 1:1 (base_conv/base_scale/wavelet_convs.{i}/
    wavelet_scale.{i}; the frozen wt/iwt filter banks are rebuilt here)."""

    c2: int
    k: int = 5
    s: int = 1
    bias: bool = True
    levels: int = 1
    wave: str = "db1"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from edgeyolo_tpu.ops.wavelets import dwt2d_kernel, idwt2d_kernel

        c = x.shape[-1]
        assert self.c2 == c, "WTConv2d keeps channels (reference asserts in==out)"
        # reference subband order from create_2d_wavelet_filter (conv.py:412):
        # [lo*lo, HI-rows*lo-cols, lo-rows*HI-cols, hi*hi] = our bank's [0,2,1,3]
        order = [0, 2, 1, 3]
        dec = dwt2d_kernel(self.wave)[:, :, 0, :][..., order]  # (kw,kw,4)
        rec = idwt2d_kernel(self.wave)[..., order]             # (kw,kw,4)
        kw = dec.shape[0]
        pad = kw // 2 - 1  # torch F.conv2d zero-pad (conv.py:432)
        dec_k = jnp.asarray(np.tile(dec[:, :, None, :], (1, 1, 1, c)), x.dtype)  # (kw,kw,1,4c) [C][4]
        # conv_transpose == dilated conv with the spatially FLIPPED kernels
        rec_k = jnp.asarray(np.tile(rec[::-1, ::-1, :, None], (1, 1, 1, c)), x.dtype)  # (kw,kw,4,c)

        base = nn.Conv(c, (self.k, self.k), padding="SAME", feature_group_count=c,
                       use_bias=self.bias, kernel_init=KERNEL_INIT, dtype=x.dtype,
                       name="base_conv")(x)
        out = _Scale(c, name="base_scale")(base)

        lls, highs, shapes = [], [], []
        cur = x
        for lv in range(self.levels):
            shapes.append(cur.shape)
            if cur.shape[1] % 2 or cur.shape[2] % 2:  # zero-pad odd dims (F.pad)
                cur = jnp.pad(cur, ((0, 0), (0, cur.shape[1] % 2),
                                    (0, cur.shape[2] % 2), (0, 0)))
            sub = jax.lax.conv_general_dilated(
                cur, dec_k, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            )  # (b, h/2, w/2, 4c) channel order [C][4]
            cur = sub.reshape(*sub.shape[:3], c, 4)[..., 0]  # next-level LL
            sub = nn.Conv(4 * c, (self.k, self.k), padding="SAME",
                          feature_group_count=4 * c, use_bias=False,
                          kernel_init=KERNEL_INIT, dtype=x.dtype,
                          name=f"wavelet_convs_{lv}")(sub)
            sub = _Scale(4 * c, init=0.1, name=f"wavelet_scale_{lv}")(sub)
            g = sub.reshape(*sub.shape[:3], c, 4)
            lls.append(g[..., 0])
            highs.append(g[..., 1:])

        # bottom-up inverse DWT with LL residual accumulation
        nxt = 0.0
        for lv in reversed(range(self.levels)):
            ll = lls[lv] + nxt
            g = jnp.concatenate([ll[..., None], highs[lv]], axis=-1)  # (b,h,w,c,4)
            g = g.reshape(*g.shape[:3], 4 * c)  # [C][4]
            nxt = jax.lax.conv_general_dilated(
                g, rec_k, window_strides=(1, 1), lhs_dilation=(2, 2),
                padding=[(kw - 1 - pad, kw - 1 - pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            )
            h0, w0 = shapes[lv][1], shapes[lv][2]
            nxt = nxt[:, :h0, :w0, :]
        out = out + nxt
        if self.s > 1:  # AvgPool2d(kernel_size=1, stride=s) == subsampling
            out = out[:, :: self.s, :: self.s, :]
        return out
