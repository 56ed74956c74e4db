"""Post-training int8 quantization (PTQ) for inference.

TPU-first design: quantization is a *functional interception* of the model's
conv calls (flax `intercept_methods`), not a parallel module zoo. One
calibration pass records per-conv input absmax; the quantized forward then
replaces every `nn.Conv` with

    x_i8 = clip(round(x / s_x))            # per-tensor symmetric activation
    y_i32 = conv(x_i8, w_i8)               # MXU int8 matmul, int32 accumulate
    y = y_i32 * (s_x * s_w[c])  (+ bias)   # per-output-channel weight scales

so the MXU runs at its 2x int8 rate and inter-layer activations materialize
as int8 (XLA fuses the requantize into the producer), cutting HBM traffic —
the one remaining lever PERF.md identified at the bf16 HBM roofline.

Reference analog: the int8 export calibrators (ultralytics/engine/
exporter.py:879 TensorRT EngineCalibrator, :1055 tflite representative-
dataset int8). The reference quantizes by exporting to another runtime; here
the quantized program is the same jitted XLA program with int8 convs.

BatchNorm, activations, decode and NMS stay fp32/bf16 — only the conv
compute and the conv-to-conv tensors drop to 8 bit, which is why mAP holds
(see tests/test_quant.py and PERF.md §int8).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["QuantState", "calibrate", "quantize", "quant_ctx"]


def _path_str(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _canon(v, n=2):
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _canon_pad(padding):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * 2
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


class QuantState:
    """Calibrated activation scales + pre-quantized int8 weights.

    act_scales: {path: float}           per-tensor symmetric input scale
    wq:         {path: int8 HWIO}       quantized kernels
    ws:         {path: f32 (cout,)}     per-output-channel weight scales
    """

    def __init__(self, act_scales, wq, ws, skip=()):
        self.act_scales = act_scales
        self.wq = wq
        self.ws = ws
        self.skip = tuple(skip)

    def skipped(self, path: str) -> bool:
        return any(s in path for s in self.skip)

    def __repr__(self):
        return (f"QuantState({len(self.wq)} int8 convs, "
                f"{len(self.act_scales)} calibrated scales, skip={self.skip})")


def _observe_interceptor(stats: dict) -> Callable:
    """Records running per-conv input absmax into `stats` (host floats)."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, nn.Conv) and context.method_name == "__call__":
            p = _path_str(mod)
            m = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            stats[p] = max(stats.get(p, 0.0), m)
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate(net, variables, batches, apply_kwargs=None) -> dict:
    """Run eager forwards over calibration batches, return {path: absmax}.

    `batches`: iterable of input arrays (model-space, i.e. normalized the way
    the engine feeds the net). Uses absmax per-tensor symmetric calibration —
    the tflite representative-dataset default (reference exporter.py:1055).
    """
    stats: dict[str, float] = {}
    kw = dict(apply_kwargs or {})
    with nn.intercept_methods(_observe_interceptor(stats)):
        for x in batches:
            net.apply(variables, jnp.asarray(x), train=False, **kw)
    return stats


def quantize(variables, act_scales: dict, skip=()) -> QuantState:
    """Pre-quantize every calibrated conv kernel to int8 + per-cout scales."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = v

    walk(variables["params"], ())
    wq, ws = {}, {}
    for path in act_scales:
        if any(s in path for s in skip):
            continue
        k = flat.get(path + "/kernel")
        if k is None or k.ndim != 4:
            continue
        kf = np.asarray(k, np.float32)
        s = np.abs(kf).max(axis=(0, 1, 2)) / 127.0
        s = np.where(s < 1e-12, 1.0, s)
        q = np.clip(np.rint(kf / s), -127, 127).astype(np.int8)
        wq[path] = jnp.asarray(q)
        ws[path] = jnp.asarray(s, jnp.float32)
    return QuantState(act_scales, wq, ws, skip)


def _quant_interceptor(qs: QuantState) -> Callable:
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not (isinstance(mod, nn.Conv) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        p = _path_str(mod)
        if p not in qs.wq or qs.skipped(p):
            return next_fun(*args, **kwargs)
        x = args[0]
        sx = jnp.float32(max(qs.act_scales[p], 1e-12) / 127.0)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, qs.wq[p],
            window_strides=_canon(mod.strides),
            padding=_canon_pad(mod.padding),
            rhs_dilation=_canon(mod.kernel_dilation),
            feature_group_count=mod.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (sx * qs.ws[p])
        if mod.use_bias and mod.has_variable("params", "bias"):
            y = y + mod.get_variable("params", "bias").astype(jnp.float32)
        return y.astype(x.dtype)

    return interceptor


class quant_ctx:
    """`with quant_ctx(qstate): net.apply(...)` — int8 forward."""

    def __init__(self, qs: QuantState):
        self._cm = nn.intercept_methods(_quant_interceptor(qs))

    def __enter__(self):
        return self._cm.__enter__()

    def __exit__(self, *a):
        return self._cm.__exit__(*a)
