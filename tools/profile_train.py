#!/usr/bin/env python
"""Training-step profiler: stage breakdown, batch sweep, roofline inputs.

Measures the flagship train step the way PERF.md measured inference
(chained dispatch, marginal per-batch time, single host fetch):

  stages (at --stage-batch): aug | fwd | fwd+loss | +grad | +opt (full, no aug)
  sweep  (full step WITH aug, i.e. exactly what the trainer runs): --batches

Also dumps XLA cost analysis (FLOPs / bytes accessed) and memory analysis
of the full step for the PERF.md roofline section.

Usage:
  python tools/profile_train.py --batches 16,32,64,128 --stage-batch 32 --amp
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def timeit(step, state_init, n_small=1, n_big=5, reps=2):
    """Chained-dispatch marginal time per call, seconds."""

    def run(n):
        t0 = time.perf_counter()
        salt = None
        st = state_init
        for _ in range(n):
            st, salt = step(st, salt)
        import jax

        jax.block_until_ready(salt)
        float(np.asarray(salt).ravel()[0])
        return time.perf_counter() - t0

    run(1)
    run(1)  # warm
    t1 = min(run(n_small) for _ in range(reps))
    tn = min(run(n_big) for _ in range(reps))
    return (tn - t1) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="edgeline-yolo.yaml")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batches", default="16,32,64,128")
    ap.add_argument("--stage-batch", type=int, default=32)
    ap.add_argument("--amp", action="store_true", default=True)
    ap.add_argument("--no-amp", dest="amp", action="store_false")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--nc", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force host CPU (the axon plugin pins jax_platforms, "
                         "env vars alone do not work)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    try:  # persistent compile cache: reruns of unchanged programs are free
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import optax

    from edgeyolo_tpu.data.augment_device import augment_batch
    from edgeyolo_tpu.nn.tasks import DetectionModel, amp_cast
    from edgeyolo_tpu.train.loss import DetectionLoss
    from edgeyolo_tpu.train.trainer import build_optimizer

    on_tpu = jax.devices()[0].platform != "cpu"
    imgsz = args.imgsz
    use_bf16 = args.amp
    M = 16  # max targets/img

    from jax.flatten_util import ravel_pytree

    from edgeyolo_tpu.train.trainer import _decay_mask

    model = DetectionModel(args.model, nc=args.nc)
    v = model.init(0, imgsz=imgsz, batch=1)
    crit = DetectionLoss(model, hyp={"box": 7.5, "cls": 0.5, "dfl": 1.5})
    # fused flat-vector optimizer state, mirroring trainer.py
    p_flat0, unravel = ravel_pytree(v["params"])
    mask_flat, _ = ravel_pytree(jax.tree.map(
        lambda p, mb: jnp.full_like(p, 1.0 if mb else 0.0),
        v["params"], _decay_mask(v["params"])))
    tx = build_optimizer(p_flat0, "SGD", 0.01, 0.937, 5e-4, lambda s: 0.01,
                         flat_mask=mask_flat)
    opt_state = tx.init(p_flat0)
    hyp = {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0,
           "translate": 0.1, "scale": 0.5, "fliplr": 0.5, "flipud": 0.0,
           "mosaic": 1.0, "mixup": 0.0, "shear": 0.0, "perspective": 0.0}

    def make_batch(B):
        rng = np.random.RandomState(0)
        img = jax.device_put(jnp.asarray(
            rng.randint(0, 255, (B, imgsz, imgsz, 3), dtype=np.uint8)))
        cls = jnp.zeros((B, M))
        bboxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.3, 0.3]], jnp.float32), (B, M, 1))
        mask = jnp.concatenate([jnp.ones((B, 4)), jnp.zeros((B, M - 4))], 1)
        return img, cls, bboxes, mask

    key = jax.random.PRNGKey(0)
    results = {}

    def emit(name, per_batch_s, B):
        results[name] = {"ms_per_batch": round(per_batch_s * 1e3, 2),
                         "imgs_per_sec": round(B / per_batch_s, 1)}
        print(json.dumps({"stage": name, "batch": B, **results[name]}), flush=True)

    # ---------------- stage breakdown at stage-batch ----------------
    def fwd_only(params, batch_stats, x):
        pc = amp_cast(params) if use_bf16 else params
        out, mut = model.apply({"params": pc, "batch_stats": batch_stats}, x,
                               train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    def loss_of(params, batch_stats, x, tgt):
        out, nbs = fwd_only(params, batch_stats, x)
        feats = [f.astype(jnp.float32) for f in out["feats"]]
        q = out.get("quality")
        if q is not None:
            q = [qq.astype(jnp.float32) for qq in q]
        loss, items = crit(feats, tgt, q)
        return loss, nbs

    if not args.no_stages:
        B = args.stage_batch
        img, cls, bboxes, mask = make_batch(B)
        tgt = {"cls": cls, "bboxes": bboxes, "mask_gt": mask}
        dt = jnp.bfloat16 if use_bf16 else jnp.float32
        x0 = (img.astype(jnp.float32) / 255.0).astype(dt)

        # 1. device augmentation alone
        @jax.jit
        def s_aug(st, salt):
            k = jax.random.fold_in(key, st)
            a = augment_batch(img, cls, bboxes, mask, k, imgsz, hyp, mosaic=True)
            return st + 1, a[0].sum()

        emit("aug", timeit(s_aug, 0), B)

        # 2. forward only (train mode, BN updates)
        @jax.jit
        def s_fwd(st, salt):
            bs = st
            out, nbs = fwd_only(v["params"], bs, x0)
            return nbs, sum(f.astype(jnp.float32).sum() for f in out["feats"])

        emit("fwd", timeit(s_fwd, v["batch_stats"]), B)

        # 3. forward + loss (TAL/assigner cost = this minus fwd)
        @jax.jit
        def s_loss(st, salt):
            loss, nbs = loss_of(v["params"], st, x0, tgt)
            return nbs, loss

        emit("fwd_loss", timeit(s_loss, v["batch_stats"]), B)

        # 4. + backward (flat grads, like the trainer)
        @jax.jit
        def s_grad(st, salt):
            (loss, nbs), g = jax.value_and_grad(
                lambda pfl, b, x, t: loss_of(unravel(pfl), b, x, t),
                has_aux=True)(p_flat0, st, x0, tgt)
            return nbs, loss + jnp.sum(jnp.abs(g[:8]))

        emit("grad", timeit(s_grad, v["batch_stats"]), B)

        # 5. full step without aug (opt+EMA delta = this minus grad)
        @jax.jit
        def s_full(st, salt):
            pf, bs, os_, ema = st
            (loss, nbs), g = jax.value_and_grad(
                lambda pfl, b, x, t: loss_of(unravel(pfl), b, x, t),
                has_aux=True)(pf, bs, x0, tgt)
            u, nos = tx.update(g, os_, pf)
            npf = pf + u
            nema = ema * 0.999 + 0.001 * npf
            return (npf, nbs, nos, nema), loss

        st0 = (p_flat0, v["batch_stats"], opt_state, jnp.copy(p_flat0))
        emit("full_noaug", timeit(s_full, st0), B)

    # ---------------- batch sweep: the real trainer step (aug included) ------
    for B in [int(b) for b in args.batches.split(",")]:
        img, cls, bboxes, mask = make_batch(B)
        dt = jnp.bfloat16 if use_bf16 else jnp.float32

        @jax.jit
        def t_step(st, salt, img=img, cls=cls, bboxes=bboxes, mask=mask):
            pf, bs, os_, ema, i = st
            k = jax.random.fold_in(key, i)
            img01, acls, aboxes, amask = augment_batch(
                img, cls, bboxes, mask, k, imgsz, hyp, mosaic=True)[:4]
            x = img01.astype(dt)
            tgt = {"cls": acls, "bboxes": aboxes, "mask_gt": amask}
            (loss, nbs), g = jax.value_and_grad(
                lambda pfl, b, xx, t: loss_of(unravel(pfl), b, xx, t),
                has_aux=True)(pf, bs, x, tgt)
            u, nos = tx.update(g, os_, pf)
            npf = pf + u
            nema = ema * 0.999 + 0.001 * npf
            return (npf, nbs, nos, nema, i + 1), loss

        st0 = (p_flat0, v["batch_stats"], tx.init(p_flat0),
               jnp.copy(p_flat0), jnp.int32(0))
        try:
            per = timeit(t_step, st0, n_big=4)
            emit(f"train_b{B}", per, B)
        except Exception as e:
            print(json.dumps({"stage": f"train_b{B}", "error": str(e)[:200]}), flush=True)
            continue

        # cost/memory analysis once, at the largest successful batch
        try:
            lowered = jax.jit(t_step).lower(st0, None)
            comp = lowered.compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            ma = comp.memory_analysis()
            print(json.dumps({
                "stage": f"analysis_b{B}",
                "gflops_per_batch": round(ca.get("flops", 0) / 1e9, 1),
                "gbytes_per_batch": round(ca.get("bytes accessed", 0) / 1e9, 2),
                "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
                "arg_bytes": getattr(ma, "argument_size_in_bytes", None),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"stage": f"analysis_b{B}", "error": str(e)[:120]}), flush=True)

    print(json.dumps({"summary": results, "amp": use_bf16, "imgsz": imgsz,
                      "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()
