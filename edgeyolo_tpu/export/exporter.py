"""Model export: StableHLO / SavedModel / TFLite / ONNX out of the jitted
inference program.

Behavioral spec: ultralytics/engine/exporter.py:107-1476 (15-format table,
@try_export wrappers, metadata embedding). The TPU-native set starts from the
XLA world: StableHLO text + a serialized jax.export artifact are the native
formats; TF-family formats go through jax2tf (availability is probed by
importing tensorflow at call time, never asserted); ONNX goes through the
in-tree jaxpr->ModelProto bridge (jax2onnx.py — no onnx package needed).
Weight export to a name-mapped npz always works and feeds the PyTorch-interop
converter.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.utils import LOGGER, colorstr

def _has_tf() -> bool:
    import importlib.util

    return importlib.util.find_spec("tensorflow") is not None


EXPORT_FORMATS = {
    # name: (suffix, available) — availability PROBED, never asserted
    "stablehlo": (".stablehlo", True),
    "jax_export": (".jaxexp", True),
    "npz": (".npz", True),
    "saved_model": ("_saved_model", _has_tf),  # via jax2tf
    "tflite": (".tflite", _has_tf),  # via jax2tf + TFLiteConverter
    "onnx": (".onnx", True),  # native jaxpr->ModelProto bridge (jax2onnx.py)
}


def format_available(fmt: str) -> bool:
    """Resolve a format's availability entry (bool or zero-arg probe) to a
    bool — the one place the bool-or-callable union is interpreted."""
    avail = EXPORT_FORMATS.get(fmt, (None, False))[1]
    return bool(avail() if callable(avail) else avail)


def try_export(fn):
    def wrapper(*args, **kwargs):
        prefix = colorstr("export:")
        t = time.time()
        try:
            out = fn(*args, **kwargs)
            LOGGER.info(f"{prefix} {fn.__name__} done in {time.time() - t:.1f}s -> {out}")
            return out
        except Exception as e:
            LOGGER.warning(f"{prefix} {fn.__name__} FAILED: {e}")
            raise

    return wrapper


class Exporter:
    def __init__(self, args):
        self.args = args

    def __call__(self, model, out_dir: str | Path = "runs/export"):
        fmt = str(self.args.format or "stablehlo").lower()
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        raw_sz = self.args.imgsz
        # the cfg surface accepts list imgsz; export is square (TPU-static
        # H/W), so take the long side
        imgsz = int(max(raw_sz)) if isinstance(raw_sz, (list, tuple)) else int(raw_sz)
        # static-shape formats (onnx via the in-tree jaxpr bridge) bake this
        # batch into the graph; callers that re-val the artifact at batch N
        # (utils/benchmarks.py) set `exporter.trace_batch = N`. Deliberately
        # NOT args.batch: the cfg default (16) is a training knob and would
        # silently bake into every standalone export.
        batch = max(1, int(getattr(self, "trace_batch", 1) or 1))
        name = Path(getattr(model.yaml, "get", lambda *_: "model")("yaml_file") or "model").stem

        variables = model.variables
        assert variables is not None, "model not initialized"
        # fold conv+BN for the exported artifact (reference Exporter fuses the
        # deepcopied model before tracing); output-identical, and non-XLA
        # consumers (tflite interpreters) get a simpler graph. The caller's
        # live variables are untouched.
        from edgeyolo_tpu.nn.tasks import fuse_conv_bn

        variables = fuse_conv_bn(variables, eps=getattr(model, "bn_eps", None))

        def fwd(img):
            return model.net.apply(variables, img, train=False)["pred"]

        x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        meta = {
            "description": "edgeyolo_tpu export",
            "imgsz": imgsz,
            "nc": model.nc,
            "names": model.names,
            "stride": list(model.stride),
            "layout": "NHWC",
            "pred": "(B, A, 4+nc) xywh pixels + class probs",
            "model_yaml": model.yaml.get("yaml_file", ""),
            "scale": model.scale,
            "task": getattr(model, "task", "detect"),
        }
        if not meta["model_yaml"]:  # dict-built (e.g. .pt-imported): embed cfg
            meta["model_cfg"] = {k: v for k, v in model.yaml.items()
                                 if isinstance(v, (int, float, str, bool, list, dict, type(None)))}

        if fmt == "stablehlo":
            return self.export_stablehlo(fwd, x, out_dir / f"{name}.stablehlo", meta)
        if fmt in {"jax_export", "jaxexp"}:
            return self.export_jax(fwd, x, out_dir / f"{name}.jaxexp", meta)
        if fmt == "npz":
            return self.export_npz(variables, out_dir / f"{name}.npz", meta)
        if fmt in {"saved_model", "tflite"}:
            return self.export_tf(fwd, x, out_dir / name, fmt, meta)
        if fmt in {"pb", "tfjs", "edgetpu"}:
            raise NotImplementedError(
                f"'{fmt}' requires toolchains absent from this image (tfjs "
                "converter / edgetpu compiler); export 'saved_model' or "
                "'tflite' and convert externally"
            )
        if fmt == "onnx":
            return self.export_onnx(fwd, x, out_dir / f"{name}.onnx", meta)
        raise ValueError(f"unknown export format '{fmt}'; supported: {list(EXPORT_FORMATS)}")

    @staticmethod
    def _export_native(fwd, x):
        """jax.export with a SYMBOLIC batch dimension (mirrors the TF path's
        polymorphic batch) so the artifact serves any batch size; falls back
        to static batch=1 if some op refuses shape polymorphism."""
        try:
            (b,) = jax.export.symbolic_shape("b")
            spec = jax.ShapeDtypeStruct((b, *x.shape[1:]), x.dtype)
            return jax.export.export(jax.jit(fwd))(spec)
        except Exception as e:
            LOGGER.warning(f"export: symbolic-batch export failed ({e}); "
                           "falling back to static batch=1")
            return jax.export.export(jax.jit(fwd))(x)

    @try_export
    def export_stablehlo(self, fwd, x, path: Path, meta: dict):
        exported = self._export_native(fwd, x)
        path.write_text(exported.mlir_module())
        # serialized twin so AutoBackend can execute the artifact (the text
        # form is for inspection/interop)
        path.with_suffix(".jaxexp").write_bytes(exported.serialize())
        path.with_suffix(".json").write_text(json.dumps(meta, default=str))
        return str(path)

    @try_export
    def export_jax(self, fwd, x, path: Path, meta: dict):
        exported = self._export_native(fwd, x)
        blob = exported.serialize()
        path.write_bytes(blob)
        path.with_suffix(".json").write_text(json.dumps(meta, default=str))
        return str(path)

    @try_export
    def export_onnx(self, fwd, x, path: Path, meta: dict):
        """Standard ONNX ModelProto (opset 17) via the in-tree jaxpr bridge
        (export/jax2onnx.py) — no onnx package needed. Reference analog:
        exporter.py:487-540 (torch.onnx.export + metadata_props).
        Static shapes at the traced batch=1 (resize externally if needed);
        metadata rides in ModelProto.metadata_props (what ultralytics-style
        AutoBackends read), the graph doc_string AND the .json sidecar."""
        from edgeyolo_tpu.export.jax2onnx import export_onnx_bytes

        blob = export_onnx_bytes(fwd, x, input_names=["images"],
                                 output_prefix="output",
                                 graph_name=path.stem,
                                 doc=json.dumps(meta, default=str),
                                 metadata={k: json.dumps(v, default=str)
                                           for k, v in meta.items()})
        path.write_bytes(blob)
        path.with_suffix(".json").write_text(json.dumps(meta, default=str))
        return str(path)

    @try_export
    def export_npz(self, variables, path: Path, meta: dict):
        flat = {}
        for coll, tree in variables.items():
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = coll + "/" + "/".join(getattr(p, "key", str(p)) for p in kp)
                flat[key] = np.asarray(leaf)
        np.savez(path, **flat)
        path.with_suffix(".json").write_text(json.dumps(meta, default=str))
        return str(path)

    @try_export
    def export_tf(self, fwd, x, path: Path, fmt: str, meta: dict):
        try:
            import tensorflow as tf  # noqa: F401
            from jax.experimental import jax2tf
        except ImportError as e:
            raise NotImplementedError(
                f"'{fmt}' export requires tensorflow (import probe failed: {e})"
            ) from e
        # batch stays polymorphic so tflite resize_tensor_input / saved_model
        # batched calls work; H/W stay static (the TPU-native design point)
        spec = tf.TensorSpec((None,) + tuple(x.shape[1:]), tf.float32)
        tf_fn = tf.function(
            jax2tf.convert(fwd, with_gradient=False,
                           polymorphic_shapes=[f"(b, {x.shape[1]}, {x.shape[2]}, 3)"],
                           # lower for BOTH platforms: native serialization
                           # otherwise embeds the exporting host's platform
                           # and a TPU-exported saved_model refuses to run on
                           # the CPU tf runtime ("platform CPU is not among
                           # the platforms required by the module")
                           native_serialization_platforms=("cpu", "tpu")),
            input_signature=[spec],
            autograph=False,
        )
        module = tf.Module()
        module.f = tf_fn
        sm_path = str(path) + "_saved_model"
        tf.saved_model.save(
            module, sm_path,
            signatures=tf_fn.get_concrete_function(spec),
        )
        Path(sm_path + ".json").write_text(json.dumps(meta, default=str))
        if fmt == "tflite":
            converter = tf.lite.TFLiteConverter.from_saved_model(sm_path)
            if bool(getattr(self.args, "int8", False)):
                # int8=True -> dynamic-range quantization (int8 weights,
                # float activations). Full-integer calibration (the
                # reference's representative-dataset path, exporter.py:1055)
                # quantizes the jax2tf-decomposed softmax/decode divs and
                # hits runtime div-by-quantized-zero; the TPU-native
                # full-int8 path is nn/quant.py (activations included),
                # this flag covers the tflite artifact size/CPU case.
                converter.optimizations = [tf.lite.Optimize.DEFAULT]
            blob = converter.convert()
            out = str(path) + ".tflite"
            Path(out).write_bytes(blob)
            Path(out).with_suffix(".json").write_text(json.dumps(meta, default=str))
            return out
        return sm_path


def load_exported(path: str | Path):
    """Round-trip a .jaxexp artifact back to a callable."""
    exported = jax.export.deserialize(Path(path).read_bytes())
    return lambda x: exported.call(x)
