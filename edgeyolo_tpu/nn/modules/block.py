"""Stock CSP/attention block zoo, NHWC / flax.linen.

Behavioral spec: ultralytics/nn/modules/block.py (C2f:357, C3:380+, C3k2:857,
SPPF:204, Bottleneck:467, Attention:1001, PSABlock fork redefinition:3376,
C2PSA:1118, PSA:1060, C2fPSA:1174, SCDown:1186, Proto:112). Re-designed for
XLA: pure functional modules, static shapes, channels-last so convs and the
attention einsums land on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from edgeyolo_tpu.nn.modules.conv import KERNEL_INIT, ConvBN, DWConv


def max_pool_same(x, k: int):
    """k x k stride-1 max pool with same-shape padding (torch MaxPool2d(k,1,k//2))."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


class Bottleneck(nn.Module):
    """Two convs with optional residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Sequence[int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class C1(nn.Module):
    """CSP bottleneck with 1 conv."""

    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = ConvBN(self.c2, 3, name=f"m_{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (split at cv1)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")(a, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2f(nn.Module):
    """Fast CSP skeleton: split, stack blocks appending to the running list, fuse.

    Subclasses override `make_block` to swap the inner block family — the
    pattern behind C3k2 / DSC3K2 / the wavelet variants.
    """

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    def make_block(self, c: int, i: int):
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")

    def enhance_b(self, b, train):
        """Hook for wavelet variants: transform the stacked branch before the chain."""
        return b

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(1, int(self.c2 * self.e))
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        b = self.enhance_b(b, train)
        ys = [a, b]
        for i in range(self.n):
            ys.append(self.make_block(c, i)(ys[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3(nn.Module):
    """Classic CSP with 3 convs."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    def make_block(self, c_: int, i: int):
        return Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, name="cv1")(x, train)
        b = ConvBN(c_, 1, name="cv2")(x, train)
        for i in range(self.n):
            a = self.make_block(c_, i)(a, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3x(C3):
    """C3 with cross 1x3/3x1 convs."""

    def make_block(self, c_: int, i: int):
        return Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, name=f"m_{i}")


class C3k(C3):
    """C3 with configurable square kernels in the bottlenecks."""

    k: int = 3

    def make_block(self, c_: int, i: int):
        return Bottleneck(c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0, name=f"m_{i}")


class C3k2(C2f):
    """YOLO11 workhorse: C2f whose blocks are C3k stacks or plain bottlenecks.

    NOTE the default: the reference C3k2 overrides C2f's shortcut default to
    True (block.py:860) — every yolo11/v13 C3k2 row relies on it (YAML rows
    never pass shortcut). Round-2 fix: this was inheriting C2f's False, which
    silently dropped every Bottleneck residual add in the C3k2 family; the
    random-init full-model parity check is numerically insensitive to it, but
    trained-weight cross-framework validation showed a 0.13 mAP50-95 gap.
    Guarded by the trained-weights micro parity in tests/test_torch_parity.py.
    """

    shortcut: bool = True
    c3k: bool = False

    def make_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, name=f"m_{i}")
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, name=f"m_{i}")


class SPP(nn.Module):
    """Spatial pyramid pooling with parallel kernel sizes."""

    c2: int
    k: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, name="cv1")(x, train)
        ys = [y] + [max_pool_same(y, k) for k in self.k]
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SPPF(nn.Module):
    """Fast SPP: three chained k=5 max pools."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(max_pool_same(ys[-1], self.k))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class Attention(nn.Module):
    """Spatial self-attention over H*W tokens with depthwise positional encoding.

    Layout: qkv 1x1 conv emits per-head [q(key_dim) | k(key_dim) | v(head_dim)]
    channel groups; attention is softmax(q k^T / sqrt(key_dim)) over keys.
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        hch = self.dim + 2 * key_dim * self.num_heads

        qkv = ConvBN(hch, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, c)
        pe = ConvBN(self.dim, 3, g=self.dim, act=False, name="pe")(v.reshape(b, h, w, c), train)
        return ConvBN(self.dim, 1, act=False, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """x = x + Attention(x); x = x + FFN(x)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int | None = None
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        heads = max(1, (self.c // 64) if self.num_heads is None else int(self.num_heads))
        x = x + Attention(self.c, heads, self.attn_ratio, name="attn")(x, train)
        hidden = int(self.c * self.mlp_ratio)
        y = ConvBN(hidden, 1, name="ffn_0")(x, train)
        y = ConvBN(self.c, 1, act=False, name="ffn_1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """CSP split with a stack of PSABlocks on one branch. Requires c1 == c2."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.c2, "C2PSA requires c1 == c2"
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c, 0.5, max(1, c // 64), name=f"m_{i}")(b, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class PSA(nn.Module):
    """Single-block position-sensitive attention (v10)."""

    c2: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.c2
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        b = b + Attention(c, max(1, c // 64), 0.5, name="attn")(b, train)
        f = ConvBN(c * 2, 1, name="ffn_0")(b, train)
        b = b + ConvBN(c, 1, act=False, name="ffn_1")(f, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2fPSA(C2f):
    """C2f with PSABlock inner blocks."""

    shortcut: bool = False

    def make_block(self, c: int, i: int):
        return PSABlock(c, 0.5, max(1, c // 64), name=f"m_{i}")


class SCDown(nn.Module):
    """Separable downsample: 1x1 pointwise then k x k depthwise stride-s."""

    c2: int
    k: int = 3
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, act=False, name="cv2")(x, train)


class Proto(nn.Module):
    """Segmentation mask prototype head (upsample + convs)."""

    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from edgeyolo_tpu.nn.modules.conv import ConvTranspose

        x = ConvBN(self.c_, 3, name="cv1")(x, train)
        # reference Proto upsample is a raw ConvTranspose2d(bias=True), no BN/act
        x = ConvTranspose(self.c_, 2, 2, 0, bn=False, act=False, name="upsample")(x, train)
        x = ConvBN(self.c_, 3, name="cv2")(x, train)
        return ConvBN(self.c2, 1, name="cv3")(x, train)


def dfl_decode(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal integral decode (fused on device).

    box_logits: (..., 4*reg_max) -> expected ltrb distances (..., 4).
    Behavioral spec: ultralytics/nn/modules/block.py:72-91 (frozen arange conv);
    here it is a softmax-weighted arange contraction XLA fuses into one kernel.
    """
    shape = box_logits.shape
    p = jax.nn.softmax(box_logits.reshape(*shape[:-1], 4, reg_max), axis=-1)
    bins = jnp.arange(reg_max, dtype=p.dtype)
    return jnp.einsum("...kr,r->...k", p, bins)
