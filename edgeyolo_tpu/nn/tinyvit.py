"""TinyViT image encoder for MobileSAM — TPU-native (flax, NHWC).

Behavioral spec: ultralytics/models/sam/modules/tiny_encoder.py:24-1013 —
Conv2d_BN building block, stride-4 PatchEmbed, MBConv stage 0, window
attention with learned per-offset attention biases (stages 1-3), PatchMerging
between stages (depthwise stride 1 for out_dim in {320,448,576}), and the
256-channel LayerNorm2d neck. MobileSAM config (build.py:56-66):
embed_dims (64,128,160,320), depths (2,2,6,2), heads (2,4,5,10),
windows (7,7,14,7). Final feature: (B, img/16, img/16, 256).

Attention-bias index tables are static per window resolution and computed in
numpy at trace time — no dynamic gathers inside the kernel.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

KINIT = nn.initializers.lecun_normal()
BN_EPS = 1e-5  # torch BatchNorm2d default (tiny_encoder uses defaults)
BN_MOM = 0.9   # flax momentum for torch momentum=0.1


class Conv2dBN(nn.Module):
    """conv(bias=False) + BN (tiny_encoder.py:24-61)."""

    b: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.b, (self.ks, self.ks), strides=(self.stride, self.stride),
                    padding=[(self.pad, self.pad), (self.pad, self.pad)],
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=KINIT, dtype=x.dtype, name="c")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=BN_MOM,
                            epsilon=BN_EPS, dtype=jnp.float32, name="bn")(x)


class MBConv(nn.Module):
    """Inverted bottleneck (tiny_encoder.py:104-163): 1x1 expand -> dw 3x3 ->
    1x1 project (BN gamma init 0), GELU between, residual, GELU after."""

    out_chans: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = int(c * self.expand_ratio)
        s = x
        x = jax.nn.gelu(Conv2dBN(h, 1, name="conv1")(x, train), approximate=False)
        x = jax.nn.gelu(Conv2dBN(h, 3, 1, 1, groups=h, name="conv2")(x, train), approximate=False)
        x = Conv2dBN(self.out_chans, 1, name="conv3")(x, train)
        return jax.nn.gelu(x + s, approximate=False)


class PatchMerging(nn.Module):
    """1x1 -> dw 3x3 (stride 2, or 1 for out_dim in {320,448,576}) -> 1x1
    (tiny_encoder.py:165-220). NHWC in, NHWC out."""

    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride_c = 1 if self.out_dim in {320, 448, 576} else 2
        x = jax.nn.gelu(Conv2dBN(self.out_dim, 1, name="conv1")(x, train), approximate=False)
        x = jax.nn.gelu(Conv2dBN(self.out_dim, 3, stride_c, 1, groups=self.out_dim,
                                 name="conv2")(x, train), approximate=False)
        return Conv2dBN(self.out_dim, 1, name="conv3")(x, train)


import functools


@functools.lru_cache(maxsize=8)
def _bias_idxs_cached(res: int):
    return _bias_idxs_impl(res)


def _bias_idxs_impl(res: int) -> np.ndarray:
    """(N, N) index table into the per-offset attention-bias bank."""
    points = list(itertools.product(range(res), range(res)))
    offsets: dict = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points), len(points))


def _bias_idxs(res: int) -> np.ndarray:
    return _bias_idxs_cached(res)


class TVAttention(nn.Module):
    """Multi-head attention with learned spatial biases
    (tiny_encoder.py:363-490), attn_ratio=1 as used in TinyViTBlock."""

    dim: int
    key_dim: int
    num_heads: int
    resolution: int

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        nh, kd = self.num_heads, self.key_dim
        d = kd  # attn_ratio=1
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(nh * (2 * kd + d), kernel_init=KINIT, name="qkv")(x)
        qkv = qkv.reshape(B, N, nh, 2 * kd + d)
        q, k, v = qkv[..., :kd], qkv[..., kd : 2 * kd], qkv[..., 2 * kd :]
        table = _bias_idxs(self.resolution)
        n_off = int(table.max() + 1)
        biases = self.param("attention_biases", nn.initializers.zeros, (nh, n_off))
        idxs = jnp.asarray(table)
        ab = biases[:, idxs]  # (nh, N, N)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * (kd ** -0.5) + ab[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, nh * d)
        return nn.Dense(self.dim, kernel_init=KINIT, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + local dw conv + MLP (tiny_encoder.py:492-648)."""

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    local_conv_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        B, H, W, C = x.shape
        ws = self.window_size
        res = x
        if H == ws and W == ws:
            a = TVAttention(self.dim, C // self.num_heads, self.num_heads, ws,
                            name="attn")(x.reshape(B, H * W, C)).reshape(B, H, W, C)
        else:
            pb = (ws - H % ws) % ws
            pr = (ws - W % ws) % ws
            xp = jnp.pad(x, ((0, 0), (0, pb), (0, pr), (0, 0)))
            pH, pW = H + pb, W + pr
            nH, nW = pH // ws, pW // ws
            wins = xp.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5)
            wins = wins.reshape(B * nH * nW, ws * ws, C)
            a = TVAttention(self.dim, C // self.num_heads, self.num_heads, ws,
                            name="attn")(wins)
            a = a.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
            a = a.reshape(B, pH, pW, C)[:, :H, :W]
        x = res + a
        x = Conv2dBN(C, self.local_conv_size, 1, self.local_conv_size // 2,
                     groups=C, name="local_conv")(x, train)
        t = x.reshape(B, H * W, C)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(t)
        h = nn.Dense(int(C * self.mlp_ratio), kernel_init=KINIT, name="mlp_fc1")(h)
        h = nn.Dense(C, kernel_init=KINIT, name="mlp_fc2")(jax.nn.gelu(h, approximate=False))
        return (t + h).reshape(B, H, W, C)


class TinyViT(nn.Module):
    """MobileSAM image encoder (tiny_encoder.py:765-1013).

    Returns (B, img/16, img/16, 256) after the LayerNorm2d neck.
    """

    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mbconv_expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ed = self.embed_dims
        x = jax.nn.gelu(Conv2dBN(ed[0] // 2, 3, 2, 1, name="patch_embed_0")(x, train),
                        approximate=False)
        x = Conv2dBN(ed[0], 3, 2, 1, name="patch_embed_1")(x, train)  # (B, S/4, S/4, C0)

        # stage 0: MBConv x depth, then merge to C1 at /8
        for j in range(self.depths[0]):
            x = MBConv(ed[0], self.mbconv_expand_ratio, name=f"s0_mb{j}")(x, train)
        x = PatchMerging(ed[1], name="s0_merge")(x, train)

        for i in (1, 2, 3):
            for j in range(self.depths[i]):
                x = TinyViTBlock(ed[i], self.num_heads[i], self.window_sizes[i],
                                 name=f"s{i}_blk{j}")(x, train)
            if i < 3:
                x = PatchMerging(ed[i + 1], name=f"s{i}_merge")(x, train)

        # neck: 1x1 -> LN2d -> 3x3 -> LN2d, 256 channels
        x = nn.Conv(256, (1, 1), use_bias=False, kernel_init=KINIT, name="neck_0")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_1")(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=KINIT, name="neck_2")(x)
        return nn.LayerNorm(epsilon=1e-6, name="neck_3")(x)
