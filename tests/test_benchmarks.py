"""Benchmark-table harness (utils/benchmarks.py — reference
utils/benchmarks.py:50-179): native + int8 + exported formats timed and
val'd through AutoBackend, gated formats reported honestly."""

import numpy as np
import pytest

from edgeyolo_tpu import YOLO
from edgeyolo_tpu.nn.tasks import DetectionModel
from edgeyolo_tpu.utils.benchmarks import benchmark


@pytest.mark.slow
def test_benchmark_table_with_int8_row(tmp_path):
    from edgeyolo_tpu.data.synthetic import generate_dataset

    data = generate_dataset(tmp_path / "ds", n_train=4, n_val=4, imgsz=64, nc=3)
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    rows = benchmark(m, imgsz=64, batch=2, iters=3, data=str(data),
                     formats=["native", "native-int8", "npz"],
                     out_dir=tmp_path / "exp", verbose=False)
    by_fmt = {r["format"]: r for r in rows}
    assert by_fmt["native"]["status"] == "ok"
    assert by_fmt["native-int8"]["status"] == "ok", by_fmt["native-int8"]
    assert by_fmt["npz"]["status"] == "ok"
    for f in ("native", "native-int8", "npz"):
        assert by_fmt[f]["imgs/s"] > 0
        assert "mAP50-95" in by_fmt[f]
    # the int8 row must leave the handle fp for later rows (npz ran after)
    assert m.model.quant is None


def test_benchmark_reports_gated_formats():
    """onnx is a WORKING row since the in-tree jaxpr->ONNX exporter landed
    (round 3); 'engine' (TensorRT) has no toolchain in this image and must
    be reported as gated, not crash the table."""
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    rows = benchmark(m, imgsz=64, batch=1, iters=2,
                     formats=["onnx", "engine"], verbose=False)
    by_fmt = {r["format"]: r for r in rows}
    assert by_fmt["onnx"]["status"] == "ok"
    assert by_fmt["engine"]["status"].startswith("gated")


@pytest.mark.slow
def test_benchmark_eager_backend_rows_val_ok(tmp_path):
    """onnx/tf-family rows val through the eager-network path (the validator
    jits only its post stage for eager_only adapters) and the static-batch
    onnx artifact is exported at the re-val batch — the two integration
    breaks the first full TPU bench_table run surfaced (round 5)."""
    from edgeyolo_tpu.data.synthetic import generate_dataset

    data = generate_dataset(tmp_path / "ds", n_train=4, n_val=4, imgsz=64, nc=3)
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    rows = benchmark(m, imgsz=64, batch=2, iters=2, data=str(data),
                     formats=["onnx"], out_dir=tmp_path / "exp", verbose=False)
    (row,) = rows
    assert row["status"] == "ok", row
    assert isinstance(row["mAP50-95"], float)
