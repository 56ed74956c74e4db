"""ONNX bridge tests: jaxpr->ModelProto converter (export/jax2onnx.py), the
hand-rolled protobuf layer (export/onnx_proto.py), the numpy executor
(export/onnx_runtime.py), and the Exporter/AutoBackend integration.

Reference surface: exporter.py:487-540 (export_onnx) + autobackend.py:186
(onnx round-trip inference). Every test is a closed loop: trace with jax ->
serialize -> parse back -> execute with numpy -> compare against the live
jax forward.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgeyolo_tpu.export.jax2onnx import export_onnx_bytes
from edgeyolo_tpu.export.onnx_proto import parse_model
from edgeyolo_tpu.export.onnx_runtime import OnnxModel


def _roundtrip(fn, *args, atol=1e-5):
    blob = export_onnx_bytes(fn, *args)
    m = OnnxModel(blob)
    got = m(*[np.asarray(a) for a in args])
    got = got if isinstance(got, list) else [got]
    want = jax.tree_util.tree_leaves(fn(*args))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=atol, rtol=1e-4)
    return m


X = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32))


@pytest.mark.parametrize("name,fn", [
    ("silu", lambda a: jax.nn.silu(a) + 1),
    ("transpose_reshape_slice", lambda a: jnp.transpose(a, (0, 3, 1, 2)).reshape(2, -1)[:, :10]),
    ("split_concat_reduce", lambda a: jnp.concatenate(jnp.split(a, 2, axis=0), axis=3).max(axis=(1, 2))),
    ("where", lambda a: jnp.where(a > 0, a, 0.1 * a)),
    ("iota_broadcast", lambda a: a + jnp.arange(8.0)[None, :, None, None]),
    ("pad_negative", lambda a: jax.lax.pad(a, 0.0, ((0, 0, 0), (1, -1, 0), (2, 2, 0), (0, 0, 0)))),
    ("softmax", lambda a: jax.nn.softmax(a, axis=-1)),
    ("rev", lambda a: jnp.flip(a, axis=(1, 2))),
    ("cumsum", lambda a: jnp.cumsum(a, axis=1)),
    ("argmax_cast", lambda a: jnp.argmax(a, axis=2).astype(jnp.float32)),
    ("clamp_minmax", lambda a: jnp.clip(a, -0.5, jnp.abs(a).mean())),
])
def test_primitive_roundtrip(name, fn):
    _roundtrip(fn, X)


def test_conv_variants_roundtrip():
    k = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, 4).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")
    _roundtrip(lambda a: jax.lax.conv_general_dilated(a, k, (1, 1), "SAME",
                                                      dimension_numbers=dn), X)
    # strided + asymmetric padding
    _roundtrip(lambda a: jax.lax.conv_general_dilated(a, k, (2, 2), [(1, 1), (0, 2)],
                                                      dimension_numbers=dn), X)
    # depthwise (feature_group_count)
    kd = jnp.asarray(np.random.RandomState(2).randn(3, 3, 1, 3).astype(np.float32))
    _roundtrip(lambda a: jax.lax.conv_general_dilated(a, kd, (1, 1), "SAME",
                                                      dimension_numbers=dn,
                                                      feature_group_count=3), X)
    # negative padding (input crop — reachable via conv_transpose configs):
    # must lower to Slice + Conv, not invalid negative ONNX pads. The golden
    # is the equivalent crop-then-pad conv: jax's CPU backend miscomputes
    # mixed negative/positive conv padding (reads junk instead of zeros at
    # the hi-padded edge; the TPU backend and the crop form agree), so the
    # raw negative-pad jax output cannot serve as reference here.
    neg = lambda a: jax.lax.conv_general_dilated(a, k, (1, 1), [(-1, 1), (0, -2)],
                                                 dimension_numbers=dn)
    blob = export_onnx_bytes(neg, X)
    got = OnnxModel(blob)(np.asarray(X))
    want = jax.lax.conv_general_dilated(X[:, 1:, :6, :], k, (1, 1),
                                        [(0, 1), (0, 0)], dimension_numbers=dn)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-4)
    # transposed conv (lhs_dilation -> explicit zero-insertion chain)
    _roundtrip(lambda a: jax.lax.conv_transpose(a, k, (2, 2), "SAME",
                                                dimension_numbers=dn), X, atol=1e-4)


def test_maxpool_roundtrip():
    import flax.linen as nn

    _roundtrip(lambda a: nn.max_pool(a, (5, 5), strides=(1, 1), padding="SAME"), X)
    _roundtrip(lambda a: nn.max_pool(a, (2, 2), strides=(2, 2)), X)


def test_dot_general_roundtrip():
    A = jnp.asarray(np.random.RandomState(3).randn(2, 5, 7).astype(np.float32))
    B = jnp.asarray(np.random.RandomState(4).randn(2, 7, 4).astype(np.float32))
    _roundtrip(lambda a, b: jnp.einsum("bij,bjk->bik", a, b), A, B)
    _roundtrip(lambda a, b: a @ b, A[0], B[0])
    # contraction over a middle axis (transpose+reshape lowering)
    _roundtrip(lambda a, b: jnp.einsum("bij,bjk->ik", a, b), A, B)


def test_proto_roundtrip_fields():
    """The hand-rolled writer must produce bytes the hand-rolled reader
    inverts exactly: opset, producer, initializer payloads, value infos."""
    blob = export_onnx_bytes(lambda a: a * 2 + jnp.arange(3.0, dtype=jnp.float32), X,
                             doc="meta-here", graph_name="g",
                             metadata={"stride": "32", "names": "{0: 'x'}"})
    m = parse_model(blob)
    assert m["producer"] == "edgeyolo_tpu"
    assert ("", 17) in m["opsets"]
    assert m["doc"] == "meta-here"
    assert m["metadata_props"] == {"stride": "32", "names": "{0: 'x'}"}
    assert m["inputs"][0]["name"] == "images"
    assert m["inputs"][0]["shape"] == [2, 8, 8, 3]
    assert m["outputs"][0]["name"] == "output0"
    # the arange const is folded+broadcast at export time; its payload must
    # survive the byte round-trip exactly
    assert any(a.size and np.allclose(np.unique(a), [0, 1, 2])
               for a in m["initializers"].values())


def test_initializer_dedup_is_content_keyed():
    """Two distinct-but-equal constants share one initializer; two different
    constants never alias (regression: id()-keyed cache aliased freed
    temporaries)."""
    c1 = jnp.full((16,), 3.0)
    c2 = jnp.full((16,), 3.0)
    c3 = jnp.full((16,), 4.0)
    blob = export_onnx_bytes(lambda a: (a[:, 0, 0, 0] + 0).reshape(2, 1) + c1 + c2 + c3, X)
    m = OnnxModel(blob)
    # the (broadcast-folded) 3.0 constant appears once, the 4.0 once; jax may
    # keep them at (16,)/(1,16) and let ONNX Add broadcast, so key on content
    # (constant-valued, 16 elements per row) rather than on a specific shape
    vals = [v for v in m.m["initializers"].values()
            if v.size >= 16 and v.size % 16 == 0 and np.all(v == v.ravel()[0])]
    assert sorted(float(v.ravel()[0]) for v in vals) == [3.0, 4.0]
    got = m(np.asarray(X))
    want = np.broadcast_to(np.asarray(X)[:, 0, 0, 0].reshape(2, 1) + 10.0,
                           np.shape(got))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_detection_model_onnx_matches_jax():
    """Full fused yolov8n forward: export -> numpy execute -> compare."""
    from edgeyolo_tpu.engine.model import YOLO
    from edgeyolo_tpu.nn.tasks import fuse_conv_bn

    m = YOLO("yolov8n.yaml")
    m._ensure_init(imgsz=64)
    v = fuse_conv_bn(m.model.variables)

    def fwd(img):
        return m.model.net.apply(v, img, train=False)["pred"]

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    _roundtrip(fwd, x, atol=5e-4)


@pytest.mark.slow
def test_exporter_autobackend_onnx_roundtrip(tmp_path):
    """Exporter(format=onnx) -> AutoBackend('.onnx') -> pred equals native;
    metadata recovered from the doc_string when the sidecar is removed."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.engine.model import YOLO
    from edgeyolo_tpu.export.exporter import EXPORT_FORMATS, Exporter
    from edgeyolo_tpu.nn.autobackend import AutoBackend

    assert EXPORT_FORMATS["onnx"][1] is True
    m = YOLO("yolov8n.yaml")
    m._ensure_init(imgsz=64)
    ex = Exporter(get_cfg(overrides={"mode": "export", "format": "onnx",
                                     "imgsz": 64}))
    path = ex(m.model, out_dir=tmp_path)
    assert path.endswith(".onnx")
    sidecar = tmp_path / (path.rsplit("/", 1)[-1].replace(".onnx", ".json"))
    assert sidecar.exists() and json.loads(sidecar.read_text())["imgsz"] == 64

    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
    want = np.asarray(m.model.apply(m.model.variables, x, train=False)["pred"])
    ab = AutoBackend(path, task="detect")
    np.testing.assert_allclose(np.asarray(ab(x)), want, atol=5e-4, rtol=1e-3)

    # metadata from the embedded doc_string alone
    sidecar.unlink()
    ab2 = AutoBackend(path, task="detect")
    assert ab2.imgsz == 64 and ab2.kind == "onnx"
    assert tuple(ab2.stride) == tuple(m.model.stride)
