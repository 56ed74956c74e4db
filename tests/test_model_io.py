"""Checkpoint/export IO correctness: task inference from sidecars, embedded
model cfgs, and batch-polymorphic native exports (review-pass regressions)."""

import json

import numpy as np
import pytest


def test_checkpoint_load_infers_task_from_sidecar(tmp_path):
    """A segment checkpoint loaded without an explicit task must dispatch the
    segment model/validator — not silently parse the head output as detect."""
    import jax
    from flax import serialization

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.nn.tasks import SegmentationModel

    m = SegmentationModel("yolo11-seg.yaml", nc=3)
    m.init(0, imgsz=64)
    ckpt = {"params": m.variables["params"],
            "batch_stats": m.variables.get("batch_stats", {}),
            "ema": m.variables["params"], "updates": 0, "epoch": 0,
            "best_fitness": 0.0}
    p = tmp_path / "last.msgpack"
    p.write_bytes(serialization.to_bytes(jax.device_get(ckpt)))
    (tmp_path / "last.json").write_text(json.dumps({
        "epoch": 0, "best_fitness": 0.0, "model_yaml": "yolo11-seg.yaml",
        "task": "segment", "scale": "n", "nc": 3, "names": {},
    }))
    y = YOLO(str(p))
    assert y.task == "segment"
    assert isinstance(y.model, SegmentationModel)

    # even without the explicit task key, the head says Segment
    (tmp_path / "last.json").write_text(json.dumps({
        "epoch": 0, "best_fitness": 0.0, "model_yaml": "yolo11-seg.yaml",
        "scale": "n", "nc": 3, "names": {},
    }))
    y2 = YOLO(str(p))
    assert y2.task == "segment"


def test_native_export_serves_any_batch(tmp_path):
    """jax.export artifacts trace a SYMBOLIC batch dim; AutoBackend must run
    them at batch sizes other than 1 (and cast bf16 inputs to f32)."""
    import jax.numpy as jnp

    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter
    from edgeyolo_tpu.nn.autobackend import AutoBackend
    from edgeyolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo11n.yaml", nc=3)
    m.init(0, imgsz=64)
    args = get_cfg(overrides={"mode": "export", "format": "jax_export", "imgsz": 64})
    out = Exporter(args)(m, out_dir=tmp_path)
    be = AutoBackend(out)
    p1 = be(jnp.zeros((1, 64, 64, 3), jnp.float32))
    p3 = be(jnp.zeros((3, 64, 64, 3), jnp.bfloat16))  # batch>1 + dtype cast
    assert p1.shape[0] == 1 and p3.shape[0] == 3
    assert p1.shape[1:] == p3.shape[1:]


def test_npz_export_embeds_cfg_and_task(tmp_path):
    """Dict-built models export an embedded model_cfg; AutoBackend rebuilds
    the right architecture AND task class from it."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter
    from edgeyolo_tpu.nn.autobackend import AutoBackend
    from edgeyolo_tpu.nn.tasks import SegmentationModel, yaml_model_load

    d = yaml_model_load("yolo11-seg.yaml")  # dict-built: no yaml name in meta
    d["scale"] = "n"
    m = SegmentationModel(dict(d, yaml_file=""), nc=3)
    m.yaml.pop("yaml_file", None)
    m.init(0, imgsz=64)
    args = get_cfg(overrides={"mode": "export", "format": "npz", "imgsz": 64})
    out = Exporter(args)(m, out_dir=tmp_path)
    meta = json.loads((tmp_path / "model.json").read_text())
    assert meta.get("model_cfg"), "embedded cfg missing for dict-built model"
    assert meta.get("task") == "segment"
    be = AutoBackend(out)
    assert isinstance(be.model, SegmentationModel) and be.task == "segment"


def test_export_rejects_unconvertible_formats(tmp_path):
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter
    from edgeyolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo11n.yaml", nc=3)
    m.init(0, imgsz=64)
    for fmt in ("pb", "tfjs", "edgetpu"):
        args = get_cfg(overrides={"mode": "export", "format": fmt, "imgsz": 64})
        with pytest.raises(NotImplementedError):
            Exporter(args)(m, out_dir=tmp_path)
