#!/usr/bin/env python
"""A/B bench: Pallas fused linear-attention kernel vs the XLA composition
(VERDICT r2 #7 wire-or-delete evidence). Measures the exact C2PSA stage
shapes of the EdgeLine flagship at 640px/b128, plus a larger-N sweep.

Usage (on TPU): python tools/bench_pallas_la.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.ops.pallas.linear_attention import _la_reference, linear_attention


def timeit(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    print(json.dumps({"platform": jax.devices()[0].platform}))
    rng = np.random.RandomState(0)
    # (B, N, H, D): C2PSA stage of edgeline-n at 640px runs N=400 (20x20 P5),
    # dim=128 -> H=2 heads x D=64 after the 0.5 ratio; sweep up for scale
    cases = [
        (128, 400, 2, 64),   # flagship b128 640px
        (128, 1600, 2, 64),  # 1280px P5 / 640px P4-size attention
        (16, 6400, 4, 64),   # large-N stress
    ]
    out = []
    for (b, n, h, d) in cases:
        q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.1)
        k = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.1)
        v = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.1)
        for dt in (jnp.float32, jnp.bfloat16):
            qq, kk, vv = (t.astype(dt) for t in (q, k, v))
            f_xla = jax.jit(_la_reference)
            f_pal = jax.jit(linear_attention)
            y1 = f_xla(qq, kk, vv)
            y2 = f_pal(qq, kk, vv)
            err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
            t_xla = timeit(f_xla, qq, kk, vv)
            t_pal = timeit(f_pal, qq, kk, vv)
            row = {"shape": [b, n, h, d], "dtype": str(dt.__name__),
                   "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pal * 1e6, 1),
                   "speedup": round(t_xla / t_pal, 3), "max_err": err}
            out.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
