#!/usr/bin/env python
"""Microbench the train-step loss/TAL block at the bench shape (PERF.md
§training): which sub-op owns the ~170 ms/b128? Candidates: lax.top_k (sort-
based on TPU), the dense (B,M,A) metric tensors, df_loss, dfl_decode.

Usage (TPU): python tools/profile_loss.py [--batch 128]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--nc", type=int, default=3)
    args = ap.parse_args()

    from edgeyolo_tpu.train.loss import DetectionLoss, df_loss
    from edgeyolo_tpu.train.tal import task_aligned_assign

    B, M, nc, reg_max = args.batch, 16, args.nc, 16
    s = args.imgsz
    shapes = [(s // 8, s // 8), (s // 16, s // 16), (s // 32, s // 32)]
    A = sum(h * w for h, w in shapes)
    no = nc + 4 * reg_max
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(B, h, w, no).astype(np.float32) * 0.5)
             for h, w in shapes]
    gtb = jnp.asarray(np.tile([[0.3, 0.3, 0.2, 0.25]], (B, M, 1)).astype(np.float32))
    gtc = jnp.zeros((B, M))
    mg = jnp.concatenate([jnp.ones((B, 4)), jnp.zeros((B, M - 4))], 1)
    batch = {"cls": gtc, "bboxes": gtb, "mask_gt": mg}
    crit = DetectionLoss(nc=nc, reg_max=reg_max, stride=(8, 16, 32))

    out = {}

    def emit(name, t):
        out[name] = round(t * 1e3, 2)
        print(json.dumps({name: out[name]}), flush=True)

    # full loss forward
    emit("loss_fwd", timeit(jax.jit(lambda f: crit(f, batch)[0]), feats))
    # full loss forward+backward (the train-step cost)
    emit("loss_fwd_bwd", timeit(jax.jit(
        lambda f: jax.grad(lambda ff: crit(ff, batch)[0])(f)[0].sum()), feats))

    # TAL alone on matching shapes
    pds = jnp.asarray(rng.rand(B, A, nc).astype(np.float32))
    pdb = jnp.asarray(rng.rand(B, A, 4).astype(np.float32) * s)
    anc = jnp.asarray(rng.rand(A, 2).astype(np.float32) * s)
    gtbp = gtb * s
    emit("tal", timeit(jax.jit(lambda a, b, c: task_aligned_assign(
        a, b, anc, gtc, c, mg, topk=10, num_classes=nc)[2].sum()), pds, pdb, gtbp))

    # top_k alone at the TAL shape
    align = jnp.asarray(rng.rand(B, M, A).astype(np.float32))
    emit("topk_only", timeit(jax.jit(lambda x: jax.lax.top_k(x, 10)[0].sum()), align))
    # iterative-max alternative
    def iter_max(x):
        tot = 0.0
        for _ in range(10):
            v = jnp.max(x, axis=-1, keepdims=True)
            i = jnp.argmax(x, axis=-1)
            tot = tot + v.sum()
            x = jnp.where(jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
                          == i[..., None], -jnp.inf, x)
        return tot
    emit("topk_iter_max", timeit(jax.jit(iter_max), align))

    # df_loss alone
    pd = jnp.asarray(rng.randn(B, A, 4, reg_max).astype(np.float32))
    tl = jnp.asarray(rng.rand(B, A, 4).astype(np.float32) * (reg_max - 1.01))
    emit("df_loss", timeit(jax.jit(lambda p, t: df_loss(p, t, reg_max).sum()), pd, tl))

    print(json.dumps({"summary": out, "batch": B, "A": A,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
