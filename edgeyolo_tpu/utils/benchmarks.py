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


class _BackendAdapter:
    """Expose an AutoBackend artifact through the model-handle surface the
    validator drives (apply/nc/names/variables), enabling per-format mAP."""

    eager_only = True  # interpreters consume concrete arrays; the validator
    # runs the network eagerly and jits only its post (NMS/scale/match)

    def __init__(self, backend, nc: int, names: dict, head_name: str = "Detect"):
        self._b = backend
        self.nc = nc
        self.names = names
        self.head_name = head_name
        self.variables = {}

    def apply(self, variables, img, train: bool = False, **kw):
        return {"pred": self._b(img)}


def _time_fn(fn, img, iters: int):
    import jax

    t0 = time.perf_counter()
    out = fn(img)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(img)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / iters


def benchmark(model, imgsz: int = 640, batch: int = 1, iters: int = 30, data=None,
              verbose: bool = True, formats=None, out_dir="runs/export_bench"):
    """Format x (latency, imgs/s [, mAP50-95]) table (reference
    utils/benchmarks.py:50-179): exports the model to every available native
    format, reloads each through AutoBackend, times the e2e pipeline and —
    when `data` is given — runs the validator against the reloaded artifact.
    Formats whose backend is genuinely absent appear with an honest 'gated'
    status (none by default: TF family runs via tensorflow, ONNX via the
    in-tree executor).
    """
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import EXPORT_FORMATS, Exporter, format_available
    from edgeyolo_tpu.nn.autobackend import AutoBackend
    from edgeyolo_tpu.ops.nms import non_max_suppression

    model._ensure_init(imgsz)
    handle = model.model
    task = getattr(model, "task", getattr(handle, "task", "detect"))
    nc = handle.nc
    use_bf16 = jax.devices()[0].platform != "cpu"
    # one batch for EVERYTHING (latency, static-shape exports, val): the val
    # runs at >=8, and the onnx bridge bakes the traced batch into its
    # reshapes, so a batch-1 export cannot serve the batch-8 re-val
    if data is not None:
        batch = max(batch, 8)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))

    @jax.jit
    def _post(pred):
        # seg/pose preds append mask-coef/kpt channels after the class probs;
        # the latency table suppresses on the shared box+cls slice
        return non_max_suppression(
            pred[..., : 4 + nc].astype(jnp.float32), conf_thres=0.25, iou_thres=0.7,
            max_det=300, max_nms=4096, multi_label=False,
        )

    def make_pipeline(apply_fn, jit_ok: bool = True):
        if jit_ok:
            @jax.jit
            def pipeline(img_u8):
                x = img_u8.astype(jnp.bfloat16 if use_bf16 else jnp.float32) / 255.0
                pred = apply_fn(x)
                return _post(pred)
            return pipeline

        # TF-family backends (tf.lite interpreter / saved_model call) consume
        # concrete arrays — tracing them under jit raises on the tracer, so
        # pre/post jit separately and call the backend eagerly
        def pipeline(img_u8):
            x = np.asarray(img_u8, np.float32) / 255.0
            pred = apply_fn(x)
            return _post(jnp.asarray(pred, jnp.float32))
        return pipeline

    def val_map(m_handle, int8=False):
        from edgeyolo_tpu.engine.validator import (
            DetectionValidator,
            OBBValidator,
            PoseValidator,
            SegmentationValidator,
        )

        # real handles val through their task's validator; backend adapters
        # expose only pred, which is the detect surface
        vcls = DetectionValidator
        if m_handle is handle:
            vcls = {"segment": SegmentationValidator, "pose": PoseValidator,
                    "obb": OBBValidator}.get(task, DetectionValidator)
        # the validator's per-call int8 flag is authoritative (it stashes any
        # active QuantState otherwise), so the int8 row must say so
        vargs = get_cfg(overrides={"mode": "val", "data": data, "imgsz": imgsz,
                                   "batch": max(batch, 8), "plots": False,
                                   "task": task, "int8": int8})
        res = vcls(vargs)(m_handle, data=data)
        return round(res.get("metrics/mAP50-95(B)", 0.0), 4)

    fmts = formats or ["native", "native-int8", *EXPORT_FORMATS]
    rows = []
    for fmt in fmts:
        if fmt not in ("native", "native-int8") and not format_available(fmt):
            rows.append({"format": fmt, "status": "gated (backend not in image)"})
            continue
        try:
            if fmt == "native":
                backend_apply = lambda x: handle.apply(handle.variables, x, train=False)["pred"]
                m_for_val = handle
            elif fmt == "native-int8":
                # int8 PTQ row (reference int8 export rows, exporter.py:879,
                # :1055): calibrate once, route through the quantized
                # interceptor (nn/quant.py). Calibration uses REAL val images
                # when available — noise calibration misranges the activation
                # scales (measured -0.14 mAP50-95 vs native on the bench_table
                # set; real-batch calibration is what the validator does)
                calib = img.astype(jnp.float32) / 255.0
                if data is not None:
                    from edgeyolo_tpu.data.dataset import (
                        YOLODataset, build_dataloader, check_det_dataset)
                    dcfg = check_det_dataset(str(data))
                    dsv = YOLODataset(dcfg["val"], imgsz=imgsz, augment=False,
                                      names=dcfg["names"])
                    first = build_dataloader(dsv, min(8, len(dsv)), shuffle=False,
                                             seed=0).first_batch()
                    calib = jnp.asarray(first["img"], jnp.float32) / 255.0
                handle.quantize(calib)
                backend_apply = lambda x: handle.apply(handle.variables, x, train=False)["pred"]
                m_for_val = handle
            else:
                ex = Exporter(get_cfg(overrides={"mode": "export", "imgsz": imgsz,
                                                 "format": fmt}))
                ex.trace_batch = batch  # static-shape formats serve the re-val batch
                path = ex(handle, out_dir=out_dir)
                ab = AutoBackend(path, task=task)
                backend_apply = lambda x, _ab=ab: _ab(x)
                m_for_val = _BackendAdapter(ab, handle.nc, handle.names,
                                            getattr(handle, "head_name", "Detect"))
            jit_ok = fmt in ("native", "native-int8") or getattr(ab, "kind", "") not in (
                "tflite", "saved_model", "onnx")
            pipeline = make_pipeline(backend_apply, jit_ok=jit_ok)
            compile_s, dt = _time_fn(pipeline, img, iters)
            ms_per_img = dt / batch * 1000
            row = {"format": fmt, "status": "ok", "compile_s": round(compile_s, 1),
                   "ms/img": round(ms_per_img, 3), "imgs/s": round(1000 / ms_per_img, 1)}
            if data is not None:
                if task == "detect" or fmt in ("native", "native-int8"):
                    row["mAP50-95"] = val_map(m_for_val, int8=(fmt == "native-int8"))
                else:  # adapters expose pred only; task validators need the
                    row["mAP50-95"] = "n/a (task)"  # full head-output dict
            rows.append(row)
        except Exception as e:
            rows.append({"format": fmt, "status": f"error: {str(e)[:60]}"})
        finally:
            if fmt == "native-int8":
                handle.quant = None  # later rows must run fp

    if verbose:
        hdr = f"{'format':<14}{'status':<28}{'ms/img':>10}{'imgs/s':>10}" + (
            f"{'mAP50-95':>10}" if data is not None else "")
        LOGGER.info(colorstr("benchmarks:") + f" imgsz={imgsz} batch={batch}\n" + hdr)
        for r in rows:
            LOGGER.info(f"{r['format']:<14}{r['status']:<28}{r.get('ms/img', ''):>10}"
                        f"{r.get('imgs/s', ''):>10}"
                        + (f"{r.get('mAP50-95', ''):>10}" if data is not None else ""))
    return rows


def profile_layers(model, imgsz: int = 640, iters: int = 10):
    """Rough per-layer timing by running truncated graphs (host-side loop).

    The reference's thop-based _profile_one_layer analog; XLA fuses across
    layers, so the per-layer deltas here are indicative, not exact.
    """
    import jax
    import jax.numpy as jnp

    handle = model.model if hasattr(model, "model") else model
    if handle.variables is None:
        handle.init(0, imgsz=imgsz)
    variables = handle.variables
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    spec = handle.spec
    results = []
    prev = 0.0
    for upto in range(1, len(spec) + 1):
        sub = type(handle.net)(spec[:upto], handle.save, head_stride=handle.stride,
                               default_act=getattr(handle.net, "default_act", "silu"))

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
