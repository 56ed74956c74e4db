"""YOLO-World engine wiring: set_classes with offline embeddings, then
train / val / predict all route text through WorldModel.apply (reference
models/yolo/world/train.py:24, nn/tasks.py:633-680). CLIP itself is gated
offline — any embedding source of width embed-dim plugs in."""

import numpy as np
import pytest

from edgeyolo_tpu import YOLO
from edgeyolo_tpu.data.synthetic import generate_dataset


@pytest.fixture(scope="module")
def shapes_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("wshapes")
    return generate_dataset(root, n_train=8, n_val=4, imgsz=96, nc=3)


@pytest.fixture(scope="module")
def world_model():
    m = YOLO("yolov8-worldv2.yaml")
    from edgeyolo_tpu.nn.tasks import WorldModel

    assert isinstance(m.model, WorldModel)
    emb = np.random.RandomState(0).randn(3, 512).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    m.model.set_classes(emb, names=["rectangle", "ellipse", "cross"])
    assert m.model.nc == 3
    return m


def test_world_predict(world_model, shapes_ds):
    img_dir = shapes_ds.parent / "images" / "val"
    results = world_model.predict(str(img_dir), imgsz=96, conf=0.0001, verbose=False)
    assert len(results) == 4
    assert results[0].orig_shape == (96, 96)


def test_world_val(world_model, shapes_ds):
    res = world_model.val(data=str(shapes_ds), imgsz=96, batch=4, plots=False)
    assert "metrics/mAP50-95(B)" in res


@pytest.mark.slow
def test_world_train_step(world_model, shapes_ds, tmp_path_factory):
    runs = tmp_path_factory.mktemp("wruns")
    fit = world_model.train(data=str(shapes_ds), epochs=1, imgsz=96, batch=4, nbs=4,
                            val=False, plots=False, close_mosaic=0, amp=False,
                            workers=0, project=str(runs), name="world", patience=3)
    assert (runs / "world" / "last.msgpack").exists()


def test_world_apply_requires_classes():
    from edgeyolo_tpu.nn.tasks import WorldModel

    m = WorldModel("yolov8-worldv2.yaml")
    # init() seeds a zero text bank; apply before set_classes still works but
    # set_classes is the product path — verify it swaps nc and names
    emb = np.eye(4, 512, dtype=np.float32)
    m.set_classes(emb, names=["a", "b", "c", "d"])
    assert m.nc == 4 and m.names[3] == "d"
