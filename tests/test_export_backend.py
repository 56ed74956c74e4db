"""Export round-trip + AutoBackend dispatch tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from edgeyolo_tpu.nn.autobackend import AutoBackend
from edgeyolo_tpu.nn.tasks import DetectionModel


@pytest.fixture(scope="module")
def small_model():
    m = DetectionModel("yolo11n.yaml", nc=3)
    m.init(0, imgsz=64)
    m.names = {0: "a", 1: "b", 2: "c"}
    return m


def test_autobackend_module(small_model):
    ab = AutoBackend(small_model)
    out = ab(jnp.zeros((1, 64, 64, 3)))
    assert out.shape[-1] == 4 + 3


def test_jax_export_roundtrip(small_model, tmp_path):
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter

    args = get_cfg(overrides={"mode": "export", "format": "jax_export", "imgsz": 64})
    exp = Exporter(args)
    path = exp(small_model, out_dir=tmp_path)
    ab = AutoBackend(path)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    y_exported = np.asarray(ab(x))
    y_live = np.asarray(small_model(x, train=False)["pred"])
    np.testing.assert_allclose(y_exported, y_live, atol=1e-4)


def test_npz_roundtrip(small_model, tmp_path):
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter
    import json

    args = get_cfg(overrides={"mode": "export", "format": "npz", "imgsz": 64})
    path = Exporter(args)(small_model, out_dir=tmp_path)
    # enrich metadata so AutoBackend can rebuild the module
    meta_p = tmp_path / "yolo11.json"
    meta = json.loads(meta_p.read_text())
    meta["model_yaml"] = "yolo11n.yaml"
    meta_p.write_text(json.dumps(meta))
    ab = AutoBackend(path)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(ab(x)), np.asarray(small_model(x, train=False)["pred"]), atol=1e-5)


def test_stablehlo_text_emitted(small_model, tmp_path):
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter

    args = get_cfg(overrides={"mode": "export", "format": "stablehlo", "imgsz": 64})
    path = Exporter(args)(small_model, out_dir=tmp_path)
    text = open(path).read(2000)
    assert "stablehlo" in text or "module" in text


tf_missing = __import__("importlib.util", fromlist=["util"]).find_spec("tensorflow") is None


@pytest.mark.skipif(tf_missing, reason="tensorflow not importable")
@pytest.mark.slow
def test_saved_model_roundtrip(small_model, tmp_path):
    """export -> tf.saved_model -> AutoBackend load -> numerically equal pred.

    Reference surface: exporter.py:1055 (TF family), autobackend.py:145-457
    (round-trip inference)."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter

    args = get_cfg(overrides={"mode": "export", "format": "saved_model", "imgsz": 64})
    path = Exporter(args)(small_model, out_dir=tmp_path)
    ab = AutoBackend(path)
    assert ab.kind == "saved_model"
    assert ab.names, "metadata sidecar (names) should round-trip"
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    y_tf = np.asarray(ab(x))
    y_live = np.asarray(small_model(x, train=False)["pred"])
    np.testing.assert_allclose(y_tf, y_live, atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(tf_missing, reason="tensorflow not importable")
@pytest.mark.slow
def test_tflite_roundtrip(small_model, tmp_path):
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter

    args = get_cfg(overrides={"mode": "export", "format": "tflite", "imgsz": 64})
    path = Exporter(args)(small_model, out_dir=tmp_path)
    assert str(path).endswith(".tflite")
    ab = AutoBackend(path)
    assert ab.kind == "tflite"
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3), jnp.float32)
    y_tfl = np.asarray(ab(x))
    y_live = np.asarray(small_model(x, train=False)["pred"])
    # tflite kernels differ more than pure TF; boxes are O(64) so compare scaled
    np.testing.assert_allclose(y_tfl, y_live, atol=5e-3, rtol=5e-3)
    # batched inference via resize_tensor_input
    xb = jnp.asarray(np.random.RandomState(4).rand(2, 64, 64, 3), jnp.float32)
    assert np.asarray(ab(xb)).shape[0] == 2


@pytest.mark.slow
def test_tflite_int8_export_roundtrip(small_model, tmp_path):
    """Full-int8 tflite (representative-dataset calibration — reference
    exporter.py:1055): converts, loads, and stays within int8-scale error of
    the live model on the box channels."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.export.exporter import Exporter

    args = get_cfg(overrides={"mode": "export", "format": "tflite", "imgsz": 64,
                              "int8": True})
    path = Exporter(args)(small_model, out_dir=tmp_path)
    assert str(path).endswith(".tflite")
    ab = AutoBackend(path)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3), jnp.float32)
    y_q = np.asarray(ab(x))
    y_live = np.asarray(small_model(x, train=False)["pred"])
    assert y_q.shape == y_live.shape
    # int8 end-to-end: coordinates are O(64) px — allow ~2 px of quant noise
    assert float(np.abs(y_q[..., :4] - y_live[..., :4]).max()) < 3.0
