"""Classification task end-to-end: dataset scan, train, val (top1/top5),
predict (Probs). Mirrors the reference's classify triple
(models/yolo/classify/{train,val,predict}.py) on a tiny synthetic
folder-per-class dataset (SURVEY.md §4 tiny-dataset strategy)."""

import numpy as np
import pytest
from PIL import Image

from edgeyolo_tpu import YOLO


def _make_cls_dataset(root, nc=3, n_per_class=4, size=64):
    """Color-coded classes: class i is a solid-ish image in channel i."""
    rng = np.random.RandomState(0)
    for split, n in (("train", n_per_class), ("val", 2)):
        for ci in range(nc):
            d = root / split / f"class_{ci}"
            d.mkdir(parents=True, exist_ok=True)
            for j in range(n):
                img = rng.randint(0, 60, (size, size, 3), np.uint8)
                img[..., ci] = rng.randint(180, 255, (size, size), np.uint8)
                Image.fromarray(img).save(d / f"{split}_{ci}_{j}.jpg")
    return root


@pytest.fixture(scope="module")
def cls_ds(tmp_path_factory):
    return _make_cls_dataset(tmp_path_factory.mktemp("clsdata"))


@pytest.fixture(scope="module")
def trained(cls_ds, tmp_path_factory):
    runs = tmp_path_factory.mktemp("runs")
    m = YOLO("yolo11-cls.yaml", task="classify")
    from edgeyolo_tpu.nn.tasks import ClassificationModel

    m.model = ClassificationModel("yolo11-cls.yaml", nc=3)
    # BN running stats (torch-parity momentum 0.03) need ~80 updates to
    # converge before eval-mode accuracy reflects the fit; 30 epochs x 3
    # batches clears that comfortably on this trivially separable set
    m.train(data=str(cls_ds), epochs=30, imgsz=64, batch=4, nbs=4, val=True,
            plots=False, amp=False, workers=0, project=str(runs), name="cls",
            patience=50, lr0=0.05, warmup_epochs=0, scale=0.2, optimizer="SGD")
    return m, runs / "cls"


def test_check_cls_dataset(cls_ds):
    from edgeyolo_tpu.data.classify import check_cls_dataset

    cfg = check_cls_dataset(cls_ds)
    assert cfg["nc"] == 3
    assert cfg["names"] == {0: "class_0", 1: "class_1", 2: "class_2"}
    assert cfg["train"].endswith("train") and cfg["val"].endswith("val")


def test_classify_dataset_items(cls_ds):
    from edgeyolo_tpu.data.classify import ClassificationDataset

    ds = ClassificationDataset(cls_ds / "train", imgsz=64)
    assert len(ds) == 12
    it = ds.get_item(0)
    assert it["img"].shape == (64, 64, 3) and it["img"].dtype == np.uint8
    assert 0 <= int(it["cls"]) < 3


@pytest.mark.slow
def test_classify_train_artifacts(trained):
    m, run_dir = trained
    assert (run_dir / "last.msgpack").exists()
    csv = (run_dir / "results.csv").read_text()
    assert "train/loss" in csv and "metrics/accuracy_top1" in csv


@pytest.mark.slow
def test_classify_val_metrics(trained, cls_ds):
    m, _ = trained
    res = m.val(data=str(cls_ds), imgsz=64, batch=4)
    assert set(res) >= {"metrics/accuracy_top1", "metrics/accuracy_top5", "fitness"}
    # 3 classes => top5 == 1.0 always; trained top1 should beat chance on this
    # trivially separable set
    assert res["metrics/accuracy_top5"] == 1.0
    assert res["metrics/accuracy_top1"] >= 0.5


@pytest.mark.slow
def test_classify_predict_probs(trained, cls_ds):
    m, _ = trained
    results = m.predict(str(cls_ds / "val" / "class_0"), imgsz=64, verbose=False)
    assert len(results) == 2
    p = results[0].probs
    assert p is not None and p.data.shape == (3,)
    assert abs(float(p.data.sum()) - 1.0) < 1e-4
    assert p.top1 in (0, 1, 2) and len(p.top5) <= 5


def test_classify_augment_batch_shapes():
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.data.augment_device import classify_augment_batch

    imgs = np.random.RandomState(1).randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = classify_augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(0),
                                 {"scale": 0.5, "fliplr": 0.5, "hsv_h": 0.015,
                                  "hsv_s": 0.7, "hsv_v": 0.4})
    assert out.shape == (4, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


@pytest.mark.slow
def test_classify_facade_adapts_nc(cls_ds, tmp_path_factory):
    """A yaml-built classify model (zoo nc=1000) must rebuild its head to the
    dataset's class count before training, like the reference
    ClassificationTrainer's get_model(cfg, nc=self.data['nc'])
    (models/yolo/classify/train.py:59-64). Regression: the facade adapted nc
    for detection tasks only, so train() on a 3-class folder raised."""
    runs = tmp_path_factory.mktemp("runs_nc")
    m = YOLO("yolo11-cls.yaml", task="classify")
    assert m.model.nc == 1000
    m.train(data=str(cls_ds), epochs=1, imgsz=64, batch=4, nbs=4, val=False,
            plots=False, amp=False, workers=0, project=str(runs), name="nc",
            patience=5, warmup_epochs=0)
    assert m.model.nc == 3
