#!/usr/bin/env python
"""Microbenchmark: formulations of the mosaic+affine bilinear warp gather.

The fused device augmentation's cost is dominated by the per-pixel image
gather. TPU gather throughput depends heavily on HOW the gather is phrased;
this compares:

  v0_current   advanced 3-index gather quads[idx, y, x] (augment_device today)
  v1_takeflat  single linearized jnp.take over a flattened (4*S*S, 3) source
  v2_u8        v1 with uint8 source, convert after the tap
  v3_nearest   single-tap nearest, linearized
  v4_onehot_mm interp as two matmuls row/col (separable approx for the
               scale-dominant case) -- NOT equivalent under rotation; only
               benched to see the MXU-path ceiling

Usage: python tools/bench_warp.py [--cpu] [--batch 32] [--imgsz 640]
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

GRAY = 114.0


def timeit(fn, *args, n=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t1s = []
    tns = []
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        tns.append(time.perf_counter() - t0)
    return (min(tns) - min(t1s)) / (n - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, S = args.batch, args.imgsz
    rng = np.random.RandomState(0)
    quads_u8 = jnp.asarray(rng.randint(0, 255, (B, 4, S, S, 3), dtype=np.uint8))
    quads = quads_u8.astype(jnp.float32)

    # random smooth sampling fields (like a mosaic+affine inverse map)
    yy = jnp.asarray(rng.rand(B, S, S).astype(np.float32) * (S - 2))
    xx = jnp.asarray(rng.rand(B, S, S).astype(np.float32) * (S - 2))
    qi = jnp.asarray(rng.randint(0, 4, (B, S, S)), jnp.int32)

    def bilinear_weights(yy, xx):
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        return y0, x0, (yy - y0)[..., None], (xx - x0)[..., None]

    @jax.jit
    def v0_current(quads, qi, yy, xx):
        def one(q, qi, yy, xx):
            y0, x0, fy, fx = bilinear_weights(yy, xx)

            def tap(yi, xi):
                valid = (yi >= 0) & (yi < S) & (xi >= 0) & (xi < S)
                v = q[qi, jnp.clip(yi, 0, S - 1), jnp.clip(xi, 0, S - 1)]
                return jnp.where(valid[..., None], v, GRAY)

            return (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
                    + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)

        return jax.vmap(one)(quads, qi, yy, xx).sum()

    @jax.jit
    def v1_takeflat(quads, qi, yy, xx):
        def one(q, qi, yy, xx):
            flat = q.reshape(4 * S * S, 3)
            y0, x0, fy, fx = bilinear_weights(yy, xx)
            base = qi * (S * S)

            def tap(yi, xi):
                valid = (yi >= 0) & (yi < S) & (xi >= 0) & (xi < S)
                lin = base + jnp.clip(yi, 0, S - 1) * S + jnp.clip(xi, 0, S - 1)
                v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(S, S, 3)
                return jnp.where(valid[..., None], v, GRAY)

            return (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
                    + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)

        return jax.vmap(one)(quads, qi, yy, xx).sum()

    @jax.jit
    def v2_u8(quads_u8, qi, yy, xx):
        def one(q, qi, yy, xx):
            flat = q.reshape(4 * S * S, 3)
            y0, x0, fy, fx = bilinear_weights(yy, xx)
            base = qi * (S * S)

            def tap(yi, xi):
                valid = (yi >= 0) & (yi < S) & (xi >= 0) & (xi < S)
                lin = base + jnp.clip(yi, 0, S - 1) * S + jnp.clip(xi, 0, S - 1)
                v = jnp.take(flat, lin.reshape(-1), axis=0).reshape(S, S, 3).astype(jnp.float32)
                return jnp.where(valid[..., None], v, GRAY)

            return (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
                    + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)

        return jax.vmap(one)(quads_u8, qi, yy, xx).sum()

    @jax.jit
    def v3_nearest(quads, qi, yy, xx):
        def one(q, qi, yy, xx):
            flat = q.reshape(4 * S * S, 3)
            yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, S - 1)
            xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, S - 1)
            lin = qi * (S * S) + yi * S + xi
            return jnp.take(flat, lin.reshape(-1), axis=0).reshape(S, S, 3)

        return jax.vmap(one)(quads, qi, yy, xx).sum()

    results = {}
    for name, fn, a in [
        ("v0_current", v0_current, (quads, qi, yy, xx)),
        ("v1_takeflat", v1_takeflat, (quads, qi, yy, xx)),
        ("v2_u8", v2_u8, (quads_u8, qi, yy, xx)),
        ("v3_nearest", v3_nearest, (quads, qi, yy, xx)),
    ]:
        try:
            t = timeit(fn, *a)
            results[name] = round(t * 1e3, 2)
            print(json.dumps({"variant": name, "ms_per_batch": results[name],
                              "imgs_per_sec": round(B / t, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)
    print(json.dumps({"summary": results, "B": B, "S": S,
                      "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()
