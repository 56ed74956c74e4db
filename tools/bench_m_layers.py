#!/usr/bin/env python
"""Per-layer roofline decomposition of yolo11m's feats stage (PERF.md
§scales-roofline follow-up): times every LayerSpec block STANDALONE at its
real input shape (b128 bf16), computes each block's own naive roofline bound
from XLA cost analysis, and compares sum-of-layers vs the fused e2e time.

Purpose: turn "feats runs 1.45x above its naive bound" into a per-shape
ledger — either some layer is fixably slow, or the gap decomposes into many
small shapes each near ITS OWN bound (= the XLA floor, a ceiling argument).

  python tools/bench_m_layers.py [model.yaml] [batch] [start_layer] [end_layer]

start/end bound the measured layer range (inclusive) — for re-measuring a
subset in a quiet window without repeating the whole sweep; the fused-e2e
comparison line only runs for a full sweep.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

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


def main():
    spec_yaml = sys.argv[1] if len(sys.argv) > 1 else "yolo11m.yaml"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 10**9
    imgsz = 640

    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.utils.profiling import cost_analysis

    model = DetectionModel(spec_yaml)
    model.init(0, imgsz=imgsz, batch=1)
    v = model.variables
    net = model.net

    # one capture pass at batch 1 records every layer's output SHAPE
    n_layers = len(net.spec)
    x1 = jnp.zeros((1, imgsz, imgsz, 3), jnp.bfloat16)
    _, caps = net.apply(v, x1, train=False, capture=tuple(range(n_layers)))
    shapes = {}
    for i, o in caps.items():
        shapes[i] = [tuple(t.shape) for t in o] if isinstance(o, (list, tuple)) \
            else [tuple(o.shape)] if hasattr(o, "shape") else None

    from edgeyolo_tpu.nn.modules.conv import bn_config, default_act

    rng = np.random.RandomState(0)
    rows = []
    for li, sp in enumerate(net.spec):
        if not (lo <= li <= hi):
            continue
        if sp.name in net.TEXT_MODULES or sp.name in ("Detect", "Segment", "Pose",
                                                      "OBB", "RTDETRDecoder"):
            continue  # heads measured as the e2e-feats delta; text models n/a
        # parent output shapes -> standalone inputs at batch B
        def shp(j):
            if j == -1:
                j = li - 1
            s = shapes[j][0] if j >= 0 else (1, imgsz, imgsz, 3)
            return (B,) + tuple(s[1:])
        ins = [jnp.asarray(rng.rand(*shp(j)).astype(np.float32), jnp.bfloat16)
               for j in sp.f]
        inp = ins[0] if len(ins) == 1 else ins
        scope = f"l{li}_{sp.name}"
        blk_params = v["params"].get(scope, {})
        blk_bs = (v.get("batch_stats") or {}).get(scope, {})
        from edgeyolo_tpu.nn.tasks import build_module
        mod = build_module(sp, {"stride": net.head_stride} if False else None)
        vars_i = {"params": blk_params}
        if blk_bs:
            vars_i["batch_stats"] = blk_bs

        def call(vv, xx, salt):
            with default_act(net.default_act), \
                    (bn_config(*net.bn) if net.bn else __import__("contextlib").nullcontext()):
                if isinstance(xx, list):
                    # cast salt to the input dtype: f32 salt + bf16 x would
                    # silently promote the whole layer to f32 timing
                    xx = [x + (salt.astype(x.dtype) if k == 0 else 0)
                          for k, x in enumerate(xx)]
                    o = mod.apply(vv, xx, train=False)
                else:
                    o = mod.apply(vv, xx + salt.astype(xx.dtype), train=False)
            leaves = jax.tree.leaves(o)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        step = jax.jit(call)
        try:
            per_batch = _timeit(step, vars_i, inp)
            ca = cost_analysis(call, vars_i, inp, jnp.bfloat16(0.0))
        except Exception as e:  # noqa: BLE001
            print(f"layer {li} {sp.name}: SKIP ({type(e).__name__}: {str(e)[:80]})")
            continue
        fl, by = ca["flops"], ca["bytes_accessed"]
        t = per_batch
        bound = max(fl / PEAK_BF16, by / PEAK_HBM)
        rows.append({
            "i": li, "name": sp.name, "args": str(sp.args)[:28],
            "out": str(shapes[li][0] if shapes.get(li) else "?"),
            "ms": round(t * 1e3, 3),
            "gflop": round(fl / 1e9, 1), "mb": round(by / 1e6, 1),
            "mfu_pct": round(100 * fl / t / PEAK_BF16, 1),
            "hbm_pct": round(100 * by / t / PEAK_HBM, 1),
            "t_over_bound": round(t / max(bound, 1e-9), 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    # fused e2e feats for the comparison line
    if lo > 0 or hi < n_layers - 1:
        Path("/tmp/bench_m_layers_partial.json").write_text(json.dumps(rows))
        return

    def feats_fn(vv, img, salt):
        x = img + salt.astype(img.dtype)
        out = net.apply(vv, x, train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out["feats"])

    img = jnp.asarray(rng.rand(B, imgsz, imgsz, 3).astype(np.float32), jnp.bfloat16)
    t_e2e = _timeit(jax.jit(feats_fn), v, img)
    t_sum = sum(r["ms"] for r in rows) / 1e3
    summary = {
        "model": spec_yaml, "batch": B,
        "e2e_feats_ms": round(t_e2e * 1e3, 2),
        "sum_layers_ms": round(t_sum * 1e3, 2),
        "fusion_gain": round(t_sum / max(t_e2e, 1e-9), 3),
        "weighted_t_over_bound": round(
            sum(r["ms"] * r["t_over_bound"] for r in rows) / max(sum(r["ms"] for r in rows), 1e-9), 3),
    }
    print(json.dumps(summary))
    out = {"rows": rows, "summary": summary}
    Path("/tmp/bench_m_layers.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
