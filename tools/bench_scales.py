"""Throughput + roofline sweep over model scales on the real chip.

For each model/batch: e2e inference (normalize + forward + DFL decode + NMS,
bf16) AND the full training step, with XLA cost analysis per config —
FLOPs, bytes accessed, arithmetic intensity, and MFU (fraction of bf16 peak)
so the compute-bound regime (yolo11s/m — round-3 verdict #3) gets the same
roofline treatment PERF.md gives the nano models. Stages can be isolated
with --stages (feats / +decode / +nms) to localize non-MXU time.

Run: python tools/bench_scales.py [--stages] [--train]  (TPU; one process at
a time). Peak numbers: v5e bf16 ~197 TFLOP/s, HBM ~819 GB/s (PERF.md).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def _timeit(step, *args):
    import jax.numpy as jnp

    def run(n_iters):
        t0 = time.perf_counter()
        salt = jnp.float32(0.0)
        for _ in range(n_iters):
            salt = step(*args, salt * 1e-12)
        float(salt)
        return time.perf_counter() - t0

    run(1); run(1)
    t1 = min(run(1), run(1))
    tn = min(run(9), run(9))
    return (tn - t1) / 8


def bench_one(spec: str, batch: int, imgsz: int = 640, stage: str = "e2e"):
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.ops.nms import non_max_suppression
    from edgeyolo_tpu.utils.profiling import cost_analysis

    model = DetectionModel(spec)
    model.init(0, imgsz=imgsz, batch=1)
    v = model.variables

    def pipeline(v, img_u8, salt):
        x = (img_u8.astype(jnp.bfloat16) + salt.astype(jnp.bfloat16)) / 255.0
        out = model.net.apply(v, x, train=False)
        if stage == "feats":
            return sum(jnp.sum(f.astype(jnp.float32)) for f in out["feats"])
        if stage == "decode":
            return jnp.sum(out["pred"].astype(jnp.float32))
        det, n = non_max_suppression(
            out["pred"].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=1024, multi_label=False, method="matrix")
        return jnp.sum(det) + n.sum()

    step = jax.jit(pipeline)
    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)))
    per_batch = _timeit(step, v, img)

    ca = cost_analysis(pipeline, v, img, jnp.float32(0.0))
    flops_img = ca["flops"] / batch
    bytes_img = ca["bytes_accessed"] / batch
    t_img = per_batch / batch
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    return {
        "model": spec, "stage": stage, "batch": batch,
        "imgs_per_sec": round(batch / per_batch, 1),
        "ms_per_img": round(t_img * 1e3, 3),
        "params_M": round(n_params / 1e6, 2),
        "gflop_per_img": round(flops_img / 1e9, 2),
        "mb_per_img": round(bytes_img / 1e6, 1),
        "arith_intensity": round(flops_img / max(bytes_img, 1), 1),
        "mfu_pct": round(100 * flops_img / t_img / PEAK_BF16, 1),
        "hbm_pct_of_accounted": round(100 * bytes_img / t_img / PEAK_HBM, 1),
    }


def bench_train_one(spec: str, batch: int, imgsz: int = 640):
    """Full train step (device augment + fwd + loss/TAL + bwd + fused SGD +
    EMA) — the PERF.md training-roofline method applied per scale."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from edgeyolo_tpu.data.augment_device import augment_batch
    from edgeyolo_tpu.nn.tasks import DetectionModel, amp_cast
    from edgeyolo_tpu.train.loss import DetectionLoss
    from edgeyolo_tpu.train.trainer import _decay_mask, build_optimizer
    from edgeyolo_tpu.utils.profiling import cost_analysis

    M = 16
    model = DetectionModel(spec, nc=3)
    v = model.init(0, imgsz=imgsz, batch=1)
    crit = DetectionLoss(model, hyp={"box": 7.5, "cls": 0.5, "dfl": 1.5})
    p_flat, unravel = ravel_pytree(v["params"])
    mask_flat, _ = ravel_pytree(jax.tree.map(
        lambda p, mb: jnp.full_like(p, 1.0 if mb else 0.0),
        v["params"], _decay_mask(v["params"])))
    tx = build_optimizer(p_flat, "SGD", 0.01, 0.937, 5e-4, lambda s: 0.01,
                         flat_mask=mask_flat)
    rng = np.random.RandomState(0)
    img = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)))
    cls = jnp.zeros((batch, M))
    bboxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.3, 0.3]], jnp.float32), (batch, M, 1))
    maskg = jnp.concatenate([jnp.ones((batch, 4)), jnp.zeros((batch, M - 4))], 1)
    hyp = {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0,
           "translate": 0.1, "scale": 0.5, "fliplr": 0.5, "flipud": 0.0,
           "mosaic": 1.0, "mixup": 0.0, "shear": 0.0, "perspective": 0.0}
    key = jax.random.PRNGKey(0)

    def tstep(st, salt):
        pf, bs, os_, ema, i = st
        k = jax.random.fold_in(key, i)
        img01, acls, aboxes, amask = augment_batch(
            img, cls, bboxes, maskg, k, imgsz, hyp, mosaic=True)[:4]
        tgt = {"cls": acls, "bboxes": aboxes, "mask_gt": amask}

        def lf(pfl):
            p = unravel(pfl)
            out, mut = model.net.apply({"params": amp_cast(p), "batch_stats": bs},
                                       img01.astype(jnp.bfloat16), train=True,
                                       mutable=["batch_stats"])
            out = {kk: ([f.astype(jnp.float32) for f in vv] if isinstance(vv, list) else vv)
                   for kk, vv in out.items()}
            loss, _ = crit(out["feats"], tgt, out.get("quality"))
            return loss + salt, mut["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(lf, has_aux=True)(pf)
        u, nos = tx.update(g, os_, pf)
        npf = pf + u
        d = 0.9999 * (1 - jnp.exp(-(i + 1) / 2000.0))
        nema = ema * d + (1 - d) * npf
        return (npf, nbs, nos, nema, i + 1), loss

    jstep = jax.jit(tstep)
    state = [(p_flat, v["batch_stats"], tx.init(p_flat), jnp.copy(p_flat),
              jnp.int32(0))]

    def run(n):
        t0 = time.perf_counter()
        loss = jnp.float32(0.0)
        for _ in range(n):
            state[0], loss = jstep(state[0], loss * 1e-12)
        float(loss)
        return time.perf_counter() - t0

    run(1); run(1)
    t1 = min(run(1), run(1))
    tn = min(run(5), run(5))
    per_batch = (tn - t1) / 4
    ca = cost_analysis(tstep, state[0], jnp.float32(0.0))
    flops_img = ca["flops"] / batch
    bytes_img = ca["bytes_accessed"] / batch
    t_img = per_batch / batch
    return {
        "model": spec, "stage": "train", "batch": batch,
        "imgs_per_sec": round(batch / per_batch, 1),
        "ms_per_img": round(t_img * 1e3, 3),
        "gflop_per_img": round(flops_img / 1e9, 2),
        "mb_per_img": round(bytes_img / 1e6, 1),
        "arith_intensity": round(flops_img / max(bytes_img, 1), 1),
        "mfu_pct": round(100 * flops_img / t_img / PEAK_BF16, 1),
        "hbm_pct_of_accounted": round(100 * bytes_img / t_img / PEAK_HBM, 1),
    }


def main():
    import jax
    assert jax.devices()[0].platform != "cpu", "scale sweep wants the real chip"
    stages = "--stages" in sys.argv
    train = "--train" in sys.argv
    rows = []
    sweep = [("edgeline-yolo.yaml", 128), ("yolo11n.yaml", 128),
             ("yolo11s.yaml", 128), ("yolo11m.yaml", 64), ("yolo11m.yaml", 128)]
    for spec, b in sweep:
        # stage isolation only where the analysis needs it (the compute-bound
        # yolo11m regime, round-3 verdict #3) — every extra stage is a full
        # XLA compile on the shared chip
        iso = stages and spec == "yolo11m.yaml"
        for stage in (("feats", "decode", "e2e") if iso else ("e2e",)):
            r = bench_one(spec, b, stage=stage)
            print(json.dumps(r), flush=True)
            rows.append(r)
    if train:
        for spec, b in (("yolo11s.yaml", 64), ("yolo11m.yaml", 32)):
            r = bench_train_one(spec, b)
            print(json.dumps(r), flush=True)
            rows.append(r)
    Path("/tmp/bench_scales.json").write_text(json.dumps(rows))


if __name__ == "__main__":
    main()
