"""EdgeLine-YOLO custom blocks: linear attention, wavelet neck, DS family.

Behavioral spec (reference, ultralytics/nn/modules/block.py):
- LinearAttention:3348-3373           O(N d^2) global mixing (softmax-k over
  head_dim, softmax-q over tokens, d x d context matmul).
- PSABlock_LinearAttention:3412-3449  residual attn + FFN.
- C2PSA_LinearAttention:3452-3497     CSP split around the LA stack.
- _PywtDWT2D:3582-3642                1-level DWT as depthwise stride-2 conv.
- _WaveletEnhancer:3645-3710          sub-band enhance with learnable softplus
  weights and tanh(gamma)-scaled residual (gamma init 0).
- C3k2_Wavelet:3713 / DSC3K2_Wavelet:3749 / SPPF_Wavelet:261 / C3k2_TWavelet:3499
- DSBottleneck:1467 / DSC3k:1506 / DSC3K2:1567
- MulGate:93 / RHJM:2011

TPU-first design notes: the DWT is a single grouped stride-2 conv XLA maps to
the MXU; linear attention is two batched d x d einsums (MXU) plus softmaxes
(VPU) — also available as a fused Pallas kernel in ops/pallas/linear_attention.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edgeyolo_tpu.nn.modules.block import C2f, C3, Bottleneck, C3k
from edgeyolo_tpu.nn.modules.conv import KERNEL_INIT, ConvBN, DSConv
from edgeyolo_tpu.ops.wavelets import dwt2d_kernel, dwt_pad_each_side


# ---------------------------------------------------------------------------
# Linear attention backbone stage
# ---------------------------------------------------------------------------
class LinearAttention(nn.Module):
    """Linear attention: y = softmax_N(q) @ (softmax_d(k)^T v), O(N d^2).

    Optionally dispatches to the fused Pallas kernel on TPU (use_pallas).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = False
    proj_bias: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        hd = self.dim // self.num_heads
        qkv = nn.Conv(3 * self.dim, (1, 1), use_bias=self.qkv_bias,
                      kernel_init=KERNEL_INIT, dtype=x.dtype, name="qkv")(x)
        # channel layout [3][heads][head_dim] to mirror the reference split
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, hd)
        if self.use_pallas:
            from edgeyolo_tpu.ops.pallas.linear_attention import linear_attention

            y = linear_attention(q, k, v)  # (b, n, heads, hd)
        else:
            k = jax.nn.softmax(k, axis=-1)   # over head_dim
            q = jax.nn.softmax(q, axis=1)    # over tokens N
            context = jnp.einsum("bnhd,bnhe->bhde", k, v)
            y = jnp.einsum("bnhd,bhde->bnhe", q, context)
        y = y.reshape(b, h, w, c)
        return nn.Conv(self.dim, (1, 1), use_bias=self.proj_bias,
                       kernel_init=KERNEL_INIT, dtype=x.dtype, name="proj")(y)


class PSABlockLinearAttention(nn.Module):
    """x = x + LinearAttention(x); x = x + FFN(x)."""

    dim: int
    attn_ratio: float = 0.5
    num_heads: int | None = None
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        heads = max(1, (self.dim // 64) if self.num_heads is None else int(self.num_heads))
        # reference PSABlock_LinearAttention defaults: qkv_bias=True, proj_bias=False
        # (block.py:3419-3434), overriding LinearAttention's own defaults.
        x = x + LinearAttention(self.dim, heads, qkv_bias=True, proj_bias=False, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = ConvBN(hidden, 1, name="ffn_0")(x, train)
        y = ConvBN(self.dim, 1, act=False, name="ffn_1")(y, train)
        return x + y


class C2PSA_LinearAttention(nn.Module):
    """CSP split + stacked linear-attention PSA blocks (EdgeLine backbone S32 stage)."""

    c2: int
    n: int = 1
    e: float = 0.5
    attn_ratio: float = 0.5
    num_heads: int | None = None
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[-1] == self.c2, "C2PSA_LinearAttention requires c1 == c2"
        c = int(self.c2 * self.e)
        heads = max(1, (c // 64) if self.num_heads is None else int(self.num_heads))
        y = ConvBN(2 * c, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlockLinearAttention(c, self.attn_ratio, heads, self.mlp_ratio, name=f"m_{i}")(b, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


# ---------------------------------------------------------------------------
# Wavelet sub-band enhancement
# ---------------------------------------------------------------------------
class DWT2D(nn.Module):
    """1-level 2D DWT as a fixed-weight depthwise stride-2 conv, NHWC.

    Returns (LL, LH, HL, HH), each (B, H', W', C). Reflect padding approximates
    pywt 'symmetric' boundaries exactly as the reference does.
    """

    wave: str = "haar"
    mode: str = "symmetric"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        kern_np = dwt2d_kernel(self.wave)  # (k,k,1,4)
        k = kern_np.shape[0]
        if k == 2 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # Haar fast path: depthwise stride-2 convs are VPU-bound on TPU;
            # a 2x2 space-to-depth + (4,4) matmul hits the MXU instead.
            b, h, w, _ = x.shape
            xr = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 5, 2, 4)
            xr = xr.reshape(b, h // 2, w // 2, c, 4)  # taps [(0,0),(0,1),(1,0),(1,1)]
            mix = jnp.asarray(kern_np.reshape(4, 4), x.dtype)  # (tap, subband)
            y = jnp.einsum("bhwct,ts->bhwcs", xr, mix)
            return y[..., 0], y[..., 1], y[..., 2], y[..., 3]
        kern = jnp.asarray(kern_np, dtype=x.dtype)
        pad = dwt_pad_each_side(self.wave)
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        kern = jnp.tile(kern, (1, 1, 1, c))  # (k,k,1,4c): per-channel 4-subband bank
        y = jax.lax.conv_general_dilated(
            x, kern, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        # output channel layout is [channel-major][subband]: (B,H',W',C*4)
        b, hh, ww, _ = y.shape
        y = y.reshape(b, hh, ww, c, 4)
        return y[..., 0], y[..., 1], y[..., 2], y[..., 3]


def _bilinear_resize(x, size):
    """Bilinear upsample; the hot exact-2x case runs as a fixed-kernel
    depthwise transposed conv (jax.image.resize's gather formulation costs
    ~10 ms/batch across the 8 wavelet blocks at 640px; the conv is MXU/VPU
    native). Interior matches half-pixel bilinear exactly; only the 1px
    border differs from edge-clamped resize."""
    b, h, w, c = x.shape
    if size == (2 * h, 2 * w):
        # separable half-pixel 2x bilinear as shift-adds + phase interleave:
        #   even[i] = 0.75 x[i] + 0.25 x[i-1];  odd[i] = 0.75 x[i] + 0.25 x[i+1]
        # (equals the k=[.25,.75,.75,.25] stride-2 transposed conv, zero edges)
        def up1d(z, axis):
            prev = jnp.pad(z, [(1, 0) if a == axis else (0, 0) for a in range(z.ndim)])[
                tuple(slice(0, -1) if a == axis else slice(None) for a in range(z.ndim))]
            nxt = jnp.pad(z, [(0, 1) if a == axis else (0, 0) for a in range(z.ndim)])[
                tuple(slice(1, None) if a == axis else slice(None) for a in range(z.ndim))]
            even = 0.75 * z + 0.25 * prev
            odd = 0.75 * z + 0.25 * nxt
            stacked = jnp.stack([even, odd], axis=axis + 1)
            shp = list(z.shape)
            shp[axis] *= 2
            return stacked.reshape(shp)

        return up1d(up1d(x, 1), 2)
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


class WaveletEnhancer(nn.Module):
    """DWT -> light per-sub-band convs -> learnable softplus-normalized weights
    -> bilinear upsample -> 1x1 fuse -> tanh(gamma)-scaled residual."""

    c: int
    use_ds: bool = False
    alpha0: Sequence[float] = (0.5, 0.2, 0.2, 0.1)
    wave: str = "haar"
    mode: str = "symmetric"

    @nn.compact
    def __call__(self, b_in, train: bool = False):
        B, H, W, C = b_in.shape
        ll, lh, hl, hh = DWT2D(self.wave, self.mode, name="dwt")(b_in, train)
        half = self.c // 2
        llp = ConvBN(half, 1, name="f_ll")(ll, train)
        f_h = DSConv(half, 3, name="f_h") if self.use_ds else ConvBN(half, 3, name="f_h")
        # the 3 high bands share f_h: one conv over a stacked batch instead of
        # three tiny-channel dispatches (shared weights AND shared BN stats,
        # matching the reference's single module applied three times)
        hb = jnp.concatenate([lh, hl, hh], axis=0)  # (3B, H/2, W/2, C)
        hp = f_h(hb, train)
        lhp, hlp, hhp = jnp.split(hp, 3, axis=0)

        alpha = self.param("alpha", lambda k: jnp.asarray(self.alpha0, jnp.float32))
        wgt = jax.nn.softplus(alpha)
        wgt = wgt / (wgt.sum() + 1e-6)
        gamma = self.param("gamma", nn.initializers.zeros, ())

        subs = [
            _bilinear_resize(p, (H, W)) * wgt[i]
            for i, p in enumerate((llp, lhp, hlp, hhp))
        ]
        y = jnp.concatenate([b_in, *subs], axis=-1)  # (B,H,W,3c)
        y = ConvBN(self.c, 1, name="fuse")(y, train)
        return b_in + jnp.tanh(gamma) * y


class C3k2_Wavelet(C2f):
    """C3k2 with the stacked branch wavelet-enhanced before the chain."""

    c3k: bool = False
    shortcut: bool = True
    wave: str = "haar"
    mode: str = "symmetric"
    use_ds: bool = False

    def make_block(self, c: int, i: int):
        if self.c3k:
            return C3k(c, 2, self.shortcut, self.g, name=f"m_{i}")
        return Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m_{i}")

    def enhance_b(self, b, train):
        c = max(1, int(self.c2 * self.e))
        return WaveletEnhancer(c, self.use_ds, wave=self.wave, mode=self.mode, name="wave")(b, train)


# ---------------------------------------------------------------------------
# Depthwise-separable family
# ---------------------------------------------------------------------------
class DSBottleneck(nn.Module):
    """Two DSConvs (k1 then dilated k2) with optional residual."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = DSConv(c_, self.k1, 1, name="cv1")(x, train)
        y = DSConv(self.c2, self.k2, 1, d=self.d2, name="cv2")(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class DSC3k(C3):
    """C3 whose inner blocks are DSBottlenecks."""

    k1: int = 3
    k2: int = 5
    d2: int = 1

    def make_block(self, c_: int, i: int):
        return DSBottleneck(c_, self.shortcut, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")


class DSC3K2(C2f):
    """C2f whose inner blocks are DSC3k stacks or DSBottlenecks."""

    dsc3k: bool = False
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1

    def make_block(self, c: int, i: int):
        if self.dsc3k:
            return DSC3k(c, 2, self.shortcut, self.g, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")
        return DSBottleneck(c, self.shortcut, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")


class DSC3K2_Wavelet(C2f):
    """The EdgeLine neck block: DSC3K2 with the b-branch wavelet enhancer.

    Signature parity: (c1, c2, n, dsc3k, e, g, shortcut, k1, k2, d2,
    wave, mode, use_ds). Reference quirk kept: with dsc3k=True the inner
    DSC3k is built with its *defaults* e=0.5, k1=3, k2=5 — the outer
    k1/k2/d2 are not forwarded (block.py:3778-3781), unlike DSC3K2 which
    forwards them with e=1.0.
    """

    dsc3k: bool = False
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1
    wave: str = "haar"
    mode: str = "symmetric"
    use_ds: bool = False

    def make_block(self, c: int, i: int):
        if self.dsc3k:
            return DSC3k(c, 2, self.shortcut, self.g, 0.5, 3, 5, 1, name=f"m_{i}")
        return DSBottleneck(c, self.shortcut, 1.0, self.k1, self.k2, self.d2, name=f"m_{i}")

    def enhance_b(self, b, train):
        c = int(self.c2 * self.e)
        return WaveletEnhancer(c, self.use_ds, wave=self.wave, mode=self.mode, name="wave")(b, train)


class SPPF_Wavelet(nn.Module):
    """SPPF variant pooling sub-bands instead of max pools: cv1 -> DWT -> 1x1/3x3
    sub-band convs at half res -> upsample -> concat(3c_) -> cv2."""

    c2: int
    k: int = 5
    wave: str = "haar"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y0 = ConvBN(c_, 1, name="cv1")(x, train)
        # NOTE the reference's HaarDWT2D (block.py:225-259) labels LH as the
        # VERTICAL-detail band (hi along rows) — the opposite of its own
        # _PywtDWT2D (block.py:3602-3605, which our DWT2D follows). Unpack in
        # the HaarDWT2D order so cv2's per-channel weights line up 1:1 with
        # torch checkpoints of this module.
        ll, hl, lh, hh = DWT2D(self.wave, name="dwt")(y0, train)
        H, W = y0.shape[1:3]
        f_h = ConvBN(c_ // 2, 3, name="f_h")
        parts = [
            _bilinear_resize(ConvBN(c_ // 2, 1, name="f_ll")(ll, train), (H, W)),
            _bilinear_resize(f_h(lh, train), (H, W)),
            _bilinear_resize(f_h(hl, train), (H, W)),
            _bilinear_resize(f_h(hh, train), (H, W)),
        ]
        y = jnp.concatenate([y0, *parts], axis=-1)  # 3*c_
        return ConvBN(self.c2, 1, name="cv2")(y, train)


class MulGate(nn.Module):
    """DSConv pre + ReLU6-gated expansion (relu6(f1) * f2, plain biased 1x1
    convs) + zero-init mix conv + zero-init BN, per-channel gamma (init 1e-2)
    scaled residual. Output channels always equal input channels (reference
    block.py:93-109 — single-channel signature, unconditional residual)."""

    c2: int  # kept for registry uniformity; must equal the input channels
    e: float = 3.0
    k: int = 7
    d: int = 1
    gamma0: float = 1e-2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        assert self.c2 == c, "MulGate keeps channels (reference signature MulGate(c))"
        y = DSConv(c, self.k, d=self.d, name="pre")(x, train)
        hidden = int(c * self.e)
        f1 = nn.Conv(hidden, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                     dtype=x.dtype, name="f1")(y)
        f2 = nn.Conv(hidden, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                     dtype=x.dtype, name="f2")(y)
        g = jax.nn.relu6(f1) * f2
        z = nn.Conv(c, (1, 1), use_bias=False, kernel_init=nn.initializers.zeros,
                    dtype=x.dtype, name="mix")(g)
        from edgeyolo_tpu.nn.modules.conv import bn_eps, bn_momentum

        z = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(),
                         epsilon=bn_eps(), dtype=jnp.float32,
                         scale_init=nn.initializers.zeros, name="bn")(z).astype(x.dtype)
        gamma = self.param("gamma", lambda _: jnp.full((c,), self.gamma0, jnp.float32))
        return x + gamma * z


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix reproducing torch
    AdaptiveAvgPool2d along one axis: out[i] = mean(in[floor(i*I/O) :
    ceil((i+1)*I/O)]). Exact for both down- and up-sampling; built at trace
    time (static shapes), applied as a tiny einsum."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil div
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool2d(x, out_hw):
    """NHWC adaptive average pool (torch F.adaptive_avg_pool2d semantics)."""
    _, h, w, _ = x.shape
    ph = jnp.asarray(_adaptive_pool_matrix(h, out_hw[0]), x.dtype)
    pw = jnp.asarray(_adaptive_pool_matrix(w, out_hw[1]), x.dtype)
    return jnp.einsum("bhwc,Hh,Ww->bHWc", x, ph, pw)


class RHJM(nn.Module):
    """ECA-style dual 1-D conv channel attention (reference block.py:2011-2056):
    local SxS adaptive-pooled branch (1-D conv over the flattened
    position-major/channel-fastest sequence) + global pooled branch, sigmoid
    gates blended by local_weight, adaptively re-pooled to HxW, multiplied in.
    Kernel size is the ECA rule k = odd(int(|log2(C)+b|/gamma))."""

    c2: int
    local_size: int = 5
    gamma: int = 2
    b: int = 1
    local_weight: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        b, h, w, c = x.shape
        t = int(abs(math.log2(c) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        k = max(k, 1)
        pad = [((k - 1) // 2, (k - 1) // 2)]
        s = self.local_size
        # local branch: adaptive pool to (S,S); NHWC reshape is already the
        # reference's position-major channel-fastest serialization
        xl = adaptive_avg_pool2d(x, (s, s))
        seq = xl.reshape(b, s * s * c, 1)
        out = nn.Conv(1, (k,), padding=pad, use_bias=False, name="conv_local")(seq)
        att_local = jax.nn.sigmoid(out.reshape(b, s, s, c))
        # global branch: GAP -> conv1d over channels -> sigmoid, broadcast to (S,S)
        g = jnp.mean(x, axis=(1, 2))  # (b, c)
        g = nn.Conv(1, (k,), padding=pad, use_bias=False, name="conv_global")(g[..., None])
        att_global = jax.nn.sigmoid(g[..., 0])[:, None, None, :]
        att = att_global * (1.0 - self.local_weight) + att_local * self.local_weight
        att = adaptive_avg_pool2d(att, (h, w))
        return x * att
