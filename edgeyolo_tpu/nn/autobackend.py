"""AutoBackend: uniform `forward(img)` over every artifact format we emit.

Behavioral spec: ultralytics/nn/autobackend.py:145-457 — one wrapper that
dispatches on file suffix and recovers metadata (names/stride/imgsz). Native
formats here are the XLA world:

  - live model handle (nn.tasks.BaseModel)          - in-process
  - trainer checkpoint  .msgpack (+ .json metadata) - flax serialization
  - exported program    .jaxexp  (jax.export blob)  - runs on any backend
  - StableHLO text      .stablehlo (inspection; executed via its .jaxexp twin)
  - weights             .npz (name-mapped arrays)   - re-attached to the spec

TF-family formats (saved_model/tflite) round-trip through tensorflow;
availability is probed by importing it, never asserted. ONNX artifacts run
through the in-tree numpy executor (export/onnx_runtime.py) — a correctness
oracle; production serving uses onnxruntime/TensorRT on the same file.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER


def _import_tf(fmt: str):
    """Probe tensorflow (never assert on the environment)."""
    try:
        import tensorflow as tf

        return tf
    except ImportError as e:
        raise NotImplementedError(
            f"{fmt} inference requires tensorflow (import probe failed: {e})"
        ) from e


class AutoBackend:
    """Load any supported artifact and expose `__call__(img) -> pred`."""

    def __init__(self, weights, task: str | None = None):
        self.task = task or "detect"
        self.kind = None
        self.names = {}
        self.stride = (8, 16, 32)
        self.imgsz = 640

        from edgeyolo_tpu.nn.tasks import BaseModel

        if isinstance(weights, BaseModel):
            self.kind = "module"
            self.model = weights
            self.names = getattr(weights, "names", {})
            self.stride = weights.stride
            return

        p = Path(str(weights))
        suffix = p.suffix.lower()
        meta_p = p.with_suffix(".json")
        meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
        self.imgsz = int(meta.get("imgsz", 640))
        if meta.get("stride"):
            self.stride = tuple(meta["stride"])

        if suffix == ".msgpack":
            from edgeyolo_tpu import YOLO

            self.kind = "checkpoint"
            y = YOLO(str(p), task=task)
            self.model = y.model
            self.task = y.task
        elif suffix in {".jaxexp"}:
            import jax

            self.kind = "jax_export"
            exported = jax.export.deserialize(p.read_bytes())
            self._call = exported.call
        elif suffix == ".stablehlo":
            twin = p.with_suffix(".jaxexp")
            if not twin.exists():
                raise FileNotFoundError(
                    f"StableHLO text is for inspection; execute via its serialized twin {twin}"
                )
            import jax

            self.kind = "jax_export"
            self._call = jax.export.deserialize(twin.read_bytes()).call
        elif suffix == ".npz":
            from edgeyolo_tpu.nn.tasks import (
                ClassificationModel,
                DetectionModel,
                OBBModel,
                PoseModel,
                SegmentationModel,
                guess_model_task,
                yaml_model_load,
            )

            self.kind = "npz"
            # exporter embeds model_cfg for dict-built models (no yaml name)
            if meta.get("model_cfg"):
                d = dict(meta["model_cfg"])
            else:
                d = yaml_model_load(meta.get("model_yaml") or "yolo11n.yaml")
            if meta.get("scale"):
                d["scale"] = meta["scale"]
            if meta.get("nc"):
                d["nc"] = int(meta["nc"])
            t = task or meta.get("task") or guess_model_task(d)
            self.task = t
            cls = {"segment": SegmentationModel, "pose": PoseModel, "obb": OBBModel,
                   "classify": ClassificationModel}.get(t, DetectionModel)
            self.model = cls(d)
            self.model.init(0, imgsz=64)
            self._load_npz(p)
        elif suffix == ".onnx":
            from edgeyolo_tpu.export.onnx_runtime import OnnxModel

            self.kind = "onnx"
            self._onnx = OnnxModel(p.read_bytes())
            if not meta and self._onnx.doc:  # metadata rides the doc_string
                try:
                    meta = json.loads(self._onnx.doc)
                    self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
                    self.imgsz = int(meta.get("imgsz", self.imgsz))
                    if meta.get("stride"):
                        self.stride = tuple(meta["stride"])
                except (ValueError, TypeError):
                    pass
        elif suffix == ".tflite":
            tf = _import_tf("tflite")
            self.kind = "tflite"
            self._interp = tf.lite.Interpreter(model_path=str(p))
            self._interp.allocate_tensors()
        elif p.is_dir() and (p / "saved_model.pb").exists():
            tf = _import_tf("saved_model")
            self.kind = "saved_model"
            sm = tf.saved_model.load(str(p))
            self._sm = sm  # keep a reference so the loaded graph stays alive
            self._call_tf = (sm.f if hasattr(sm, "f")
                             else sm.signatures["serving_default"])
        else:
            raise ValueError(f"unsupported weights format: {weights}")

    def _load_npz(self, path: Path):
        import jax

        blobs = dict(np.load(path))
        flat = {}
        for coll in ("params", "batch_stats"):
            tree = self.model.variables.get(coll, {})
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            rebuilt = []
            for kp, leaf in leaves:
                key = coll + "/" + "/".join(getattr(pp, "key", str(pp)) for pp in kp)
                if key not in blobs:
                    raise KeyError(f"npz missing {key}")
                if blobs[key].shape != leaf.shape:
                    raise ValueError(f"shape mismatch for {key}: {blobs[key].shape} vs {leaf.shape}")
                rebuilt.append(blobs[key])
            treedef = jax.tree_util.tree_structure(tree)
            flat[coll] = jax.tree_util.tree_unflatten(treedef, rebuilt)
        self.model.variables = flat

    def __call__(self, img):
        """img: (B, H, W, 3) float in [0,1]. Returns the raw pred tensor."""
        if self.kind in {"module", "checkpoint", "npz"}:
            out = self.model(img, train=False)
            return out["pred"] if isinstance(out, dict) else out
        if self.kind == "tflite":
            return self._run_tflite(img)
        if self.kind == "onnx":
            import jax.numpy as jnp

            # in-tree numpy executor (export/onnx_runtime.py); production
            # deployments run the same file under onnxruntime/TensorRT
            out = self._onnx(np.asarray(img, np.float32))
            return jnp.asarray(out[0] if isinstance(out, list) else out)
        if self.kind == "saved_model":
            import jax.numpy as jnp

            out = self._call_tf(np.asarray(img, np.float32))
            if isinstance(out, dict):  # serving_default returns a dict
                out = next(iter(out.values()))
            return jnp.asarray(out.numpy())
        import jax.numpy as jnp

        # exported programs are dtype-exact: cast bf16/f64 inputs to the f32
        # the artifact was traced at
        return self._call(jnp.asarray(img, jnp.float32))

    def _run_tflite(self, img):
        import jax.numpy as jnp

        x = np.asarray(img, np.float32)
        inp = self._interp.get_input_details()[0]
        if tuple(inp["shape"]) != x.shape:  # exported at batch=1; resize for B>1
            self._interp.resize_tensor_input(inp["index"], list(x.shape))
            self._interp.allocate_tensors()
            inp = self._interp.get_input_details()[0]
        self._interp.set_tensor(inp["index"], x)
        self._interp.invoke()
        out = self._interp.get_output_details()[0]
        return jnp.asarray(self._interp.get_tensor(out["index"]))

    def warmup(self, imgsz: int | None = None, batch: int = 1):
        import jax.numpy as jnp

        s = imgsz or self.imgsz
        _ = self(jnp.zeros((batch, s, s, 3), jnp.float32))
        LOGGER.info(f"AutoBackend({self.kind}) warmed at {s}px")
        return self
