#!/usr/bin/env python
"""Why is int8 PTQ slower than bf16 (PERF.md §int8)? Microbench three
strategies on a conv chain at flagship mid-network shapes:

  A. bf16 weights + activations (the fast path today)
  B. int8 conv: quantize input, int8 kernel, int32 accumulate (nn/quant.py)
  C. int8 STORAGE: activations materialize int8 between layers, conv runs
     bf16 (dequant fuses into the consumer's operand read)

Usage (TPU): python tools/profile_int8.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def conv(x, w, **kw):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)


def main():
    rng = np.random.RandomState(0)
    B, H, W, C = 128, 80, 80, 64
    DEPTH = 8
    wf = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
          for _ in range(DEPTH)]
    wbf = [w.astype(jnp.bfloat16) for w in wf]
    ws = [jnp.abs(w).max(axis=(0, 1, 2)) / 127.0 for w in wf]
    wq = [jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
          for w, s in zip(wf, ws)]
    x0 = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    sx = jnp.float32(1.0 / 127.0)

    @jax.jit
    def chain_bf16(x):
        x = x.astype(jnp.bfloat16)
        for w in wbf:
            x = jax.nn.silu(conv(x, w))
        return x.astype(jnp.float32).sum()

    @jax.jit
    def chain_int8_conv(x):
        y = x
        for w8, s in zip(wq, ws):
            xq = jnp.clip(jnp.round(y.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
            yi = conv(xq, w8, preferred_element_type=jnp.int32)
            y = jax.nn.silu((yi.astype(jnp.float32) * (sx * s))).astype(jnp.bfloat16)
        return y.astype(jnp.float32).sum()

    @jax.jit
    def chain_int8_storage(x):
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        for w in wbf:
            xb = xq.astype(jnp.bfloat16) * jnp.bfloat16(sx)  # fuses into conv read
            y = jax.nn.silu(conv(xb, w))
            xq = jnp.clip(jnp.round(y.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        return xq.astype(jnp.float32).sum()

    out = {}
    for name, fn in (("bf16", chain_bf16), ("int8_conv", chain_int8_conv),
                     ("int8_storage", chain_int8_storage)):
        t = timeit(fn, x0)
        out[name] = round(t * 1e3, 2)
        print(json.dumps({name + "_ms": out[name]}), flush=True)
    print(json.dumps({"summary": out, "shape": [B, H, W, C], "depth": DEPTH,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
