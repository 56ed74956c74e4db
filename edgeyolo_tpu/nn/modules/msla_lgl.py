"""Intended-behavior implementations of the reference's broken families:
MSLA multi-scale linear attention, LGL local/global blocks, multi-level
wavelet mixer (C3AW_MLM) and their DSC3K2/HyperACE integrations.

The reference versions are non-instantiable in the surveyed snapshot — a
commented-out class header at block.py:2753 silently merges
`LinearAttention_MSLA` into `IHaarDWT2D`, breaking `MSLA` (block.py:2822),
`WaveletMixerMultiLevel` (2604), `C3AW_MLM`, `HyperACE_Wavelet`,
`Wavelet_SS2D`, `DSC3K2_MSLA` and `DSC3K2_LGL` (SURVEY.md §2.3 'Verified
defects'). Per the survey, this module implements the *intent*:

- MSLA (block.py:2797-3041): 4-way channel split -> DW conv 3/5/7/9 ->
  shared per-quarter linear attention -> learnable scale weights -> 1x1
  fuse; injected into the CSP skeleton as a gated residual.
- LGL (block.py:3042-3346): sigmoid-gated local conv aggregation
  alternating with sub-sampled global attention.
- WaveletMixerMultiLevel / IHaarDWT2D (2600-2783): J-level Haar analysis,
  lightweight sub-band mixing with linear attention at the coarsest LL,
  inverse-Haar reconstruction with center-crop alignment.
- SS2D fallback (2198-2599): the reference's non-Mamba path reduces to 1-D
  sequence mixers over 4 scan directions — implemented as SeqMixer1D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from edgeyolo_tpu.nn.modules.block import C2f
from edgeyolo_tpu.nn.modules.conv import KERNEL_INIT, ConvBN
from edgeyolo_tpu.nn.modules.edgeline import DSC3k, DSBottleneck, DWT2D, LinearAttention
from edgeyolo_tpu.ops.wavelets import idwt2d_kernel


class MSLA(nn.Module):
    """Multi-scale linear attention over four channel quarters."""

    dim: int
    num_heads: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c4 = self.dim // 4
        heads = max(1, min(self.num_heads, c4))
        parts = jnp.split(x, 4, axis=-1)
        attn = LinearAttention(c4, heads, name="linear_attention")
        outs = []
        scale = self.param("scale_weights", nn.initializers.ones, (4,))
        for i, (p, k) in enumerate(zip(parts, (3, 5, 7, 9))):
            p = ConvBN(c4, k, g=c4, act=False, name=f"dw_{k}x{k}")(p, train)
            outs.append(attn(p, train) * scale[i])
        y = jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.dim, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                       dtype=x.dtype, name="final_conv")(y)


class DSC3K2_MSLA(C2f):
    """DSC3K2 with a zero-init gated MSLA residual on the fused output."""

    dsc3k: bool = False
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1
    num_heads: int = 2

    def make_block(self, c: int, i: int):
        if self.dsc3k:
            return DSC3k(c, 2, self.shortcut, self.g, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")
        return DSBottleneck(c, self.shortcut, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(1, int(self.c2 * self.e))
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        ys = [a, b]
        for i in range(self.n):
            ys.append(self.make_block(c, i)(ys[-1], train))
        out = ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)
        if self.c2 % 4 == 0:
            gamma = self.param("gamma", nn.initializers.zeros, ())
            out = out + jnp.tanh(gamma) * MSLA(self.c2, self.num_heads, name="msla")(out, train)
        return out


class LocalAgg(nn.Module):
    """Sigmoid-gated local aggregation (9x9 depthwise pos-embed + conv attn
    + conv MLP, each injected as x += x * (sigmoid(f(x)) - 0.5))."""

    dim: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pe = ConvBN(self.dim, 9, 1, 4, g=self.dim, act=False, name="pos_embed")(x, train)
        x = x + x * (jax.nn.sigmoid(pe) - 0.5)
        a = ConvBN(self.dim, 1, act=False, name="conv1")(x, train)
        a = ConvBN(self.dim, 9, 1, 4, g=self.dim, act=False, name="attn")(a, train)
        a = ConvBN(self.dim, 1, act=False, name="conv2")(a, train)
        x = x + x * (jax.nn.sigmoid(a) - 0.5)
        hidden = int(self.dim * self.mlp_ratio)
        m = ConvBN(hidden, 1, act="silu", name="mlp_0")(x, train)
        m = ConvBN(self.dim, 1, act=False, name="mlp_1")(m, train)
        return x + x * (jax.nn.sigmoid(m) - 0.5)


class GlobalSparseAttn(nn.Module):
    """Sub-sampled global attention: avg-pool by sr, full MHA on the coarse
    grid, depthwise transposed-conv propagation back to full resolution."""

    dim: int
    num_heads: int = 8
    sr_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        sr = self.sr_ratio if (h % self.sr_ratio == 0 and w % self.sr_ratio == 0) else 1
        z = nn.avg_pool(x, (sr, sr), strides=(sr, sr)) if sr > 1 else x
        hs, ws = z.shape[1:3]
        n = hs * ws
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=False, kernel_init=KERNEL_INIT, name="qkv")(
            z.reshape(b, n, c)).reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, hs, ws, c)
        out = nn.Dense(c, kernel_init=KERNEL_INIT, name="proj")(out)
        if sr > 1:
            # channel-independent learned upsample (ConvTranspose groups=dim)
            out = jnp.repeat(jnp.repeat(out, sr, axis=1), sr, axis=2)
            out = ConvBN(c, 3, 1, 1, g=c, act=False, name="local_prop")(out, train)
            out = nn.LayerNorm(name="norm")(out).astype(out.dtype)
        return out


class LGLBlock(nn.Module):
    """Local aggregation followed by residual global sparse attention."""

    dim: int
    num_heads: int = 4
    sr_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = LocalAgg(self.dim, name="local")(x, train)
        return x + GlobalSparseAttn(self.dim, max(1, min(self.num_heads, self.dim // 16)),
                                    self.sr_ratio, name="global")(x, train)


class DSC3K2_LGL(C2f):
    """DSC3K2-shaped CSP with LGL inner blocks."""

    dsc3k: bool = False
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1

    def make_block(self, c: int, i: int):
        return LGLBlock(c, name=f"m_{i}")


class IHaarDWT2D(nn.Module):
    """1-level inverse Haar: (LL, LH, HL, HH) -> full-resolution map."""

    wave: str = "haar"

    @nn.compact
    def __call__(self, subbands, train: bool = False):
        ll, lh, hl, hh = subbands
        b, h, w, c = ll.shape
        kern = jnp.asarray(idwt2d_kernel(self.wave), ll.dtype)  # (2,2,4) for haar
        # synthesis = sum_s upsample-interleave(sub_s) * kernel_s; for haar the
        # 2x2 synthesis taps make this an exact space-to-depth inverse:
        stack = jnp.stack([ll, lh, hl, hh], axis=-1)  # (b,h,w,c,4)
        taps = kern.reshape(4, 4)  # (tap(di,dj), subband)
        quad = jnp.einsum("bhwcs,ts->bhwct", stack, taps)  # (b,h,w,c,4taps)
        quad = quad.reshape(b, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
        return quad.reshape(b, 2 * h, 2 * w, c)


class WaveletMixerMultiLevel(nn.Module):
    """J-level Haar pyramid: mix each detail level with a shared 3x3 DW conv,
    apply linear attention at the coarsest LL, reconstruct via inverse Haar
    with center-crop alignment to the input size."""

    dim: int
    levels: int = 2
    num_heads: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, H, W, c = x.shape
        dwt = DWT2D("haar", name="dwt")
        details = []
        cur = x
        for lv in range(self.levels):
            if cur.shape[1] < 2 or cur.shape[2] < 2:
                break
            ll, lh, hl, hh = dwt(cur, train)
            mixed = [
                ConvBN(c, 3, g=c, act=False, name=f"mix_{lv}_{i}")(s, train)
                for i, s in enumerate((lh, hl, hh))
            ]
            details.append(mixed)
            cur = ll
        heads = max(1, min(self.num_heads, c))
        cur = cur + LinearAttention(c, heads, name="ll_attention")(cur, train)
        for lv in reversed(range(len(details))):
            lh, hl, hh = details[lv]
            target = lh.shape[1:3]
            cur = cur[:, : target[0], : target[1]]  # center/leading crop align
            cur = IHaarDWT2D(name=f"idwt_{lv}" if lv else "idwt")( (cur, lh, hl, hh), train)
        cur = cur[:, :H, :W]
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + jnp.tanh(gamma) * ConvBN(c, 1, act=False, name="fuse")(cur, train)


class C3AW_MLM(nn.Module):
    """CSP split around the multi-level wavelet mixer (C3-shaped)."""

    c2: int
    e: float = 1.0
    levels: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = max(4, int(self.c2 * self.e))
        a = ConvBN(c_, 1, name="cv1")(x, train)
        bpath = ConvBN(c_, 1, name="cv2")(x, train)
        a = WaveletMixerMultiLevel(c_, self.levels, name="m")(a, train)
        return ConvBN(self.c2, 1, name="cv3")(jnp.concatenate([a, bpath], axis=-1), train)


class SeqMixer1D(nn.Module):
    """1-D depthwise sequence mixer — the reference SS2D fallback path
    (block.py:2198-2599 runs 4-direction scans through these when the
    optional Mamba kernel is absent)."""

    dim: int
    k: int = 7

    @nn.compact
    def __call__(self, seq):
        # seq: (B, N, C); depthwise temporal conv + gate
        x = nn.Conv(self.dim, (self.k,), padding="SAME", feature_group_count=self.dim,
                    use_bias=True, kernel_init=KERNEL_INIT, name="mix")(seq)
        gate = jax.nn.sigmoid(nn.Dense(self.dim, kernel_init=KERNEL_INIT, name="gate")(seq))
        return seq + x * gate


class LocalSS2DContext(nn.Module):
    """4-direction (JEGO-style) scan context: row/col forward/backward 1-D
    mixers, averaged, gated into the input."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        rows = x.reshape(b, h * w, c)
        cols = x.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        mixer = SeqMixer1D(c, name="mixer")
        outs = [
            mixer(rows).reshape(b, h, w, c),
            mixer(rows[:, ::-1])[:, ::-1].reshape(b, h, w, c),
            mixer(cols).reshape(b, w, h, c).transpose(0, 2, 1, 3),
            mixer(cols[:, ::-1])[:, ::-1].reshape(b, w, h, c).transpose(0, 2, 1, 3),
        ]
        ctx = sum(outs) / 4.0
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + jnp.tanh(gamma) * ctx


class HyperACE_Wavelet(nn.Module):
    """HyperACE variant with C3AW_MLM wavelet branches (intent of
    block.py:2058-2196; FiLM-gated SS2D context on the low-order chain)."""

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
        from edgeyolo_tpu.nn.modules.extra import FuseModule

        c1 = xs[1].shape[-1]
        c = int(self.c2 * self.e1)
        x = FuseModule(c1, self.channel_adjust, name="fuse")(xs, train)
        y = list(jnp.split(ConvBN(3 * c, 1, name="cv1")(x, train), 3, axis=-1))
        out1 = C3AW_MLM(c, self.e2, name="branch1")(y[1], train)
        out2 = C3AW_MLM(c, self.e2, name="branch2")(y[1], train)
        for i in range(self.n):
            blk = (DSC3k(c, 2, self.shortcut, 1, 0.5, 3, 7, name=f"m_{i}") if self.dsc3k
                   else DSBottleneck(c, self.shortcut, name=f"m_{i}"))
            y.append(blk(y[-1], train))
        y[-1] = LocalSS2DContext(c, name="ss2d")(y[-1], train)
        y[1] = out1
        y.append(out2)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(y, axis=-1), train)


class Wavelet_SS2D(HyperACE_Wavelet):
    """Alias emphasizing the SS2D-context variant (reference block.py:2179)."""
