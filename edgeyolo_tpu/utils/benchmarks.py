"""Benchmark harness: throughput/latency table over export formats + model info.

Behavioral spec: ultralytics/utils/benchmarks.py:50-179 (format x (mAP, ms)
table) and ProfileModels:315 (per-model timing). Native formats here are the
XLA ones; the table reports end-to-end device latency (preproc + forward +
decode + NMS).
"""

from __future__ import annotations

import time

import numpy as np

from edgeyolo_tpu.utils import LOGGER, colorstr


def benchmark(model, imgsz: int = 640, batch: int = 1, iters: int = 30, data=None, verbose: bool = True):
    """Time the jitted e2e pipeline; optionally evaluate mAP if data given.

    Returns list of row dicts (format, ok, ms/img, imgs/s [, mAP]).
    """
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.ops.nms import non_max_suppression

    model._ensure_init(imgsz)
    handle = model.model
    variables = handle.variables
    use_bf16 = jax.devices()[0].platform != "cpu"

    @jax.jit
    def pipeline(v, img_u8):
        x = img_u8.astype(jnp.bfloat16 if use_bf16 else jnp.float32) / 255.0
        out = handle.net.apply(v, x, train=False)
        return non_max_suppression(
            out["pred"].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=4096, multi_label=False,
        )

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    out = pipeline(variables, img)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(variables, img)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ms_per_img = dt / (iters * batch) * 1000

    rows = [{
        "format": "xla-jit (native)",
        "status": "ok",
        "compile_s": round(compile_s, 1),
        "ms/img": round(ms_per_img, 3),
        "imgs/s": round(1000 / ms_per_img, 1),
    }]
    if data is not None:
        res = model.val(data=data, imgsz=imgsz, batch=max(batch, 8), plots=False, verbose=False)
        rows[0]["mAP50-95"] = round(res.get("metrics/mAP50-95(B)", 0.0), 4)

    if verbose:
        hdr = f"{'format':<20}{'status':<8}{'ms/img':>10}{'imgs/s':>10}"
        LOGGER.info(colorstr("benchmarks:") + f" imgsz={imgsz} batch={batch}\n" + hdr)
        for r in rows:
            LOGGER.info(f"{r['format']:<20}{r['status']:<8}{r['ms/img']:>10}{r['imgs/s']:>10}")
    return rows


def profile_layers(model, imgsz: int = 640, iters: int = 10):
    """Rough per-layer timing by running truncated graphs (host-side loop).

    The reference's thop-based _profile_one_layer analog; XLA fuses across
    layers, so the per-layer deltas here are indicative, not exact.
    """
    import jax
    import jax.numpy as jnp

    handle = model.model if hasattr(model, "model") else model
    variables = handle.variables
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    spec = handle.spec
    results = []
    prev = 0.0
    for upto in range(1, len(spec) + 1):
        sub = type(handle.net)(spec[:upto], handle.save, head_stride=handle.stride)

        def fwd(v, xx):
            return sub.apply(v, xx, train=False)

        try:
            f = jax.jit(fwd)
            out = f(variables, x)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(variables, x)
            jax.block_until_ready(out)
            t = (time.perf_counter() - t0) / iters * 1000
            results.append({"layer": spec[upto - 1].name, "i": upto - 1, "cum_ms": round(t, 3),
                            "delta_ms": round(t - prev, 3)})
            prev = t
        except Exception as e:  # heads return dicts; sub-graphs may not be truncatable
            results.append({"layer": spec[upto - 1].name, "i": upto - 1, "error": str(e)[:60]})
    return results
