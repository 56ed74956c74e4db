"""Convolution modules, NHWC / flax.linen.

TPU-first re-design of the reference conv zoo (behavioral spec:
ultralytics/nn/modules/conv.py — Conv=conv+BN+SiLU:41, DSConv:87, DWConv:124,
GhostConv:180, Focus:161, Concat:345). Everything is channels-last so XLA
tiles convs straight onto the MXU; BN runs in fp32. BN eps/momentum follow
the reference's TWO-LEVEL convention: modules are built with plain torch
BatchNorm2d defaults (eps=1e-5 / momentum=0.1, reference conv.py:50), but
`initialize_weights` — called from DetectionModel.__init__ (reference
nn/tasks.py:367) — then overrides EVERY BatchNorm2d to eps=1e-3 /
momentum=0.03 (reference utils/torch_utils.py:410-419). ClassificationModel
never calls it (reference nn/tasks.py:457-480), so classify keeps the
constructor defaults. Here the override is a trace-time `bn_config` scope
that the detection-family GraphNet enters (see nn/tasks.py), mirroring the
model-level (not module-level) nature of the reference override.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# torch BatchNorm2d constructor defaults (flax momentum 0.9 == torch 0.1);
# what a bare module uses outside any model — matches reference modules
# instantiated standalone (e.g. unit parity dumps).
BN_EPS = 1e-5
BN_MOMENTUM = 0.9
# the initialize_weights override every detection-family model runs with
# (reference utils/torch_utils.py:410-419; flax momentum 0.97 == torch 0.03)
MODEL_BN_EPS = 1e-3
MODEL_BN_MOMENTUM = 0.97

_BN_SCOPE = {"eps": BN_EPS, "momentum": BN_MOMENTUM}


def bn_eps() -> float:
    return _BN_SCOPE["eps"]


def bn_momentum() -> float:
    return _BN_SCOPE["momentum"]


class bn_config:
    """Trace-time scope for the BN eps/momentum convention (the TPU analog of
    the reference's initialize_weights BN override, torch_utils.py:410-419)."""

    def __init__(self, eps: float = MODEL_BN_EPS, momentum: float = MODEL_BN_MOMENTUM):
        self.val = {"eps": eps, "momentum": momentum}

    def __enter__(self):
        self.prev = dict(_BN_SCOPE)
        _BN_SCOPE.update(self.val)

    def __exit__(self, *exc):
        _BN_SCOPE.update(self.prev)


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-shape padding for stride-1 (and floor-div behavior for stride-2)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def silu(x):
    return jax.nn.silu(x)


# trace-time default for `act=True` — the reference's `Conv.default_act`
# class-attribute global (its parse_model mutates it so NESTED convs, e.g.
# SPPF internals and Detect towers, also honor a yaml `activation:` override).
# GraphNet scopes it per-model with the `default_act` context manager, which
# is safer than the reference's sticky class attribute.
_DEFAULT_ACT = "silu"


class default_act:
    """Context manager scoping the act=True resolution during a trace."""

    def __init__(self, name: str | None):
        self.name = name or "silu"

    def __enter__(self):
        global _DEFAULT_ACT
        self.prev = _DEFAULT_ACT
        _DEFAULT_ACT = self.name

    def __exit__(self, *exc):
        global _DEFAULT_ACT
        _DEFAULT_ACT = self.prev


class ConvBN(nn.Module):
    """conv(bias=False) -> BatchNorm -> activation. The universal building block."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool | str = True  # True=SiLU, False=identity, or name: "relu", "relu6", "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            kernel_init=KERNEL_INIT,
            dtype=x.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=bn_momentum(),
            epsilon=bn_eps(),
            dtype=jnp.float32,
            name="bn",
        )(x).astype(x.dtype)  # f32 norm math, then back to the compute dtype
        return _apply_act(x, self.act)


def _apply_act(x, act):
    if act is True:
        act = _DEFAULT_ACT
    if act is False or act is None:
        return x
    if act == "telu":
        from edgeyolo_tpu.nn.modules.activation import telu

        return telu(x)
    return {"relu": jax.nn.relu, "relu6": jax.nn.relu6, "silu": jax.nn.silu,
            "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}[act](x)


# Alias matching the reference module name in YAML specs.
class Conv(ConvBN):
    pass


class Conv2d(nn.Module):
    """Plain conv with bias (the reference's raw nn.Conv2d head predictors)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    bias: bool = True
    bias_init_value: float | Sequence[float] | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p)
        bias_init = nn.initializers.zeros
        if self.bias_init_value is not None:
            v = self.bias_init_value
            bias_init = (lambda key, shape, dtype=jnp.float32: jnp.full(shape, v, dtype))
        return nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            use_bias=self.bias,
            kernel_init=KERNEL_INIT,
            bias_init=bias_init,
            dtype=x.dtype,
            name="conv",
        )(x)


class DWConv(nn.Module):
    """Depthwise conv (+BN+act): groups = gcd(c1, c2)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # flat conv/bn naming (the reference's DWConv IS a Conv — conv.py:124)
        g = math.gcd(x.shape[-1], self.c2)
        pad = autopad(self.k, None, self.d)
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=g,
                    kernel_dilation=(self.d, self.d), use_bias=False,
                    kernel_init=KERNEL_INIT, dtype=x.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(),
                         epsilon=bn_eps(), dtype=jnp.float32, name="bn")(x).astype(x.dtype)
        return _apply_act(x, self.act)


class DSConv(nn.Module):
    """Depthwise-separable conv: DW (no norm) -> PW 1x1 -> BN -> SiLU.

    Note the reference applies a single BN after the pointwise conv
    (ultralytics/nn/modules/conv.py:87-105); we keep that exact structure.
    """

    c2: int
    k: int = 3
    s: int = 1
    p: int | None = None
    d: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        pad = self.p if self.p is not None else (self.d * (self.k - 1)) // 2
        x = nn.Conv(c1, (self.k, self.k), strides=(self.s, self.s),
                    padding=[(pad, pad), (pad, pad)], feature_group_count=c1,
                    kernel_dilation=(self.d, self.d), use_bias=False,
                    kernel_init=KERNEL_INIT, dtype=x.dtype, name="dw")(x)
        x = nn.Conv(self.c2, (1, 1), use_bias=False, kernel_init=KERNEL_INIT,
                    dtype=x.dtype, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(),
                         epsilon=bn_eps(), dtype=jnp.float32, name="bn")(x).astype(x.dtype)
        return jax.nn.silu(x)


class LightConv(nn.Module):
    """1x1 conv (no act) + DW conv (ReLU)."""

    c2: int
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c2, 1, act=False, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act="relu", name="conv2")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution: primary 1x1-ish conv + cheap 5x5 depthwise expansion."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, None, self.g, 1, self.act, name="cv1")(x, train)
        y2 = ConvBN(c_, 5, 1, None, c_, 1, self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Focus(nn.Module):
    """Space-to-depth 2x then conv (YOLOv5 stem)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
        )
        return ConvBN(self.c2, self.k, self.s, self.p, self.g, 1, self.act, name="conv")(x, train)


class ConvTranspose(nn.Module):
    """Transposed conv + optional BN + act (2x upsample path)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k, s, p) output = (in-1)*s - 2p + k; for the
        # common k==s, p=0 exact-upsample case flax 'SAME' reproduces in*s.
        pad = "SAME" if (self.p == 0 and self.k == self.s) else [(self.p, self.p), (self.p, self.p)]
        x = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                             padding=pad,
                             use_bias=not self.bn, kernel_init=KERNEL_INIT,
                             dtype=x.dtype, name="conv_transpose")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=bn_momentum(),
                             epsilon=bn_eps(), dtype=jnp.float32, name="bn")(x).astype(x.dtype)
        return _apply_act(x, self.act)


class Concat(nn.Module):
    """Concatenate a list of tensors along channels (axis=-1 in NHWC)."""

    dim: int = 1  # reference passes torch dim=1 (channels); mapped to -1 here

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class Upsample(nn.Module):
    """Nearest/bilinear upsample (reference: torch nn.Upsample)."""

    size: Any = None
    scale_factor: float = 2.0
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.size is not None:
            nh, nw = self.size
        else:
            nh, nw = int(h * self.scale_factor), int(w * self.scale_factor)
        if self.mode == "nearest" and self.size is None and float(self.scale_factor).is_integer():
            f = int(self.scale_factor)
            return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
        method = {"nearest": "nearest", "bilinear": "bilinear"}[self.mode]
        return jax.image.resize(x, (b, nh, nw, c), method=method)


class MaxPool2d(nn.Module):
    """Max pooling (reference: torch nn.MaxPool2d; used by yolov3-tiny)."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.p, self.p), (self.p, self.p)]
        return nn.max_pool(x, (self.k, self.k), strides=(self.s, self.s), padding=pad)


class ZeroPad2d(nn.Module):
    """Zero padding (torch convention: (left, right, top, bottom))."""

    pad: Any = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.pad
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Index(nn.Module):
    """Select one output from a list input (reference conv.py:392)."""

    c2: int = 0
    index: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class ChannelAttention(nn.Module):
    """SE-style channel attention (global pool -> 1x1 conv -> sigmoid gate)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.channels, (1, 1), use_bias=True, kernel_init=KERNEL_INIT,
                    dtype=x.dtype, name="fc")(p)
        return x * jax.nn.sigmoid(a)


class SpatialAttention(nn.Module):
    """Spatial attention over channel mean/max maps."""

    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = nn.Conv(1, (self.k, self.k), padding="SAME", use_bias=False,
                    kernel_init=KERNEL_INIT, dtype=x.dtype, name="cv1")(
            jnp.concatenate([avg, mx], axis=-1))
        return x * jax.nn.sigmoid(a)


class CBAM(nn.Module):
    """Channel + spatial attention."""

    c1: int
    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(self.c1, name="channel_attention")(x, train)
        return SpatialAttention(self.k, name="spatial_attention")(x, train)


class Identity(nn.Module):
    """Pass-through node (graph anchor for multi-branch specs like yolov9e)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
