"""End-to-end tests through the public YOLO facade on a synthetic dataset —
the reference's tiny-dataset e2e strategy (SURVEY.md §4), fully offline.

Kept deliberately small (1-CPU CI): one short train run, val, predict,
checkpoint round-trip.
"""

import numpy as np
import pytest
from pathlib import Path

from edgeyolo_tpu import YOLO
from edgeyolo_tpu.data.synthetic import generate_dataset
from edgeyolo_tpu.nn.tasks import DetectionModel

pytestmark = pytest.mark.slow  # heavy: see README fast tier


@pytest.fixture(scope="module")
def shapes_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes")
    return generate_dataset(root, n_train=8, n_val=4, imgsz=96, nc=3)


@pytest.fixture(scope="module")
def trained(shapes_ds, tmp_path_factory):
    runs = tmp_path_factory.mktemp("runs")
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    m.train(data=str(shapes_ds), epochs=2, imgsz=96, batch=4, nbs=4, val=False,
            plots=False, close_mosaic=0, amp=False, workers=0, mosaic=1.0,
            project=str(runs), name="e2e", patience=5)
    return m, runs / "e2e"


def test_train_produces_artifacts(trained):
    m, run_dir = trained
    assert (run_dir / "last.msgpack").exists()
    assert (run_dir / "results.csv").exists()
    assert (run_dir / "args.yaml").exists()
    csv = (run_dir / "results.csv").read_text()
    assert "train/box_loss" in csv and csv.count("\n") >= 3


def test_val_runs_and_reports(trained, shapes_ds):
    m, _ = trained
    res = m.val(data=str(shapes_ds), imgsz=96, batch=4, plots=False)
    assert "metrics/mAP50-95(B)" in res and "fitness" in res
    assert res["metrics/mAP50-95(B)"] >= 0.0


def test_predict_returns_results(trained, shapes_ds):
    m, _ = trained
    img_dir = shapes_ds.parent / "images" / "val"
    results = m.predict(str(img_dir), imgsz=96, conf=0.01, verbose=False)
    assert len(results) == 4
    r = results[0]
    assert r.orig_shape == (96, 96)
    assert r.plot().shape == (96, 96, 3)


def test_checkpoint_roundtrip(trained):
    m, run_dir = trained
    m2 = YOLO(str(run_dir / "last.msgpack"))
    import jax

    p1 = jax.tree.leaves(m.model.variables["params"])
    p2 = jax.tree.leaves(m2.model.variables["params"])
    # loaded model uses EMA weights; shapes must match and values be finite
    assert all(a.shape == b.shape for a, b in zip(p1, p2))
    assert m2.model.nc == 3


def test_stream_predict_generator(trained, shapes_ds):
    m, _ = trained
    img_dir = shapes_ds.parent / "images" / "val"
    gen = m.predict(str(img_dir), imgsz=96, stream=True, verbose=False)
    first = next(iter(gen))
    assert first.orig_shape == (96, 96)


def test_seg_val_native_and_proto_mask_iou(tmp_path_factory):
    """SegmentationValidator end-to-end at both mask-IoU resolutions.

    Native-res (default) upsamples pred+gt masks to imgsz on device and
    ships only the IoU matrix (reference ops.py:663-738 process_mask
    upsample); proto keeps the round-2 comparison grid. On the synthetic
    shapes set (big convex masks) the two must broadly agree, and native
    must not degrade the mask mAP (finer boundaries only help here)."""
    from edgeyolo_tpu.cfg import get_cfg
    from edgeyolo_tpu.data.synthetic import generate_dataset
    from edgeyolo_tpu.engine.validator import SegmentationValidator
    from edgeyolo_tpu.nn.tasks import SegmentationModel

    root = tmp_path_factory.mktemp("segval")
    data = generate_dataset(root, n_train=4, n_val=4, imgsz=96, nc=2, task="segment")
    m = SegmentationModel("yolo11-seg.yaml", nc=2)
    m.init(0, imgsz=96)
    vargs = get_cfg(overrides={"mode": "val", "imgsz": 96, "batch": 4, "conf": 0.25,
                               "iou": 0.7, "max_det": 32, "task": "segment"})
    res_nat = SegmentationValidator(vargs, save_dir=root / "v1")(m, data=data)
    res_pro = SegmentationValidator(vargs, save_dir=root / "v2",
                                    mask_iou_res="proto")(m, data=data)
    for res in (res_nat, res_pro):
        assert "metrics/mAP50-95(M)" in res
        assert np.isfinite(res["metrics/mAP50-95(M)"])
    # random-init model: both near zero; just require same box metrics
    assert res_nat["metrics/mAP50-95(B)"] == res_pro["metrics/mAP50-95(B)"]


def test_train_partial_final_batch(tmp_path_factory):
    """Dataset size not divisible by batch: the padded duplicates in the
    final batch must ride through the jitted step at zero weight (img_weight
    plumbing) and training must stay finite."""
    runs = tmp_path_factory.mktemp("runs_partial")
    root = tmp_path_factory.mktemp("shapes_partial")
    data = generate_dataset(root, n_train=6, n_val=4, imgsz=96, nc=3)  # 6 % 4 != 0
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    m.train(data=str(data), epochs=1, imgsz=96, batch=4, nbs=4, val=False,
            plots=False, close_mosaic=0, amp=False, workers=0,
            project=str(runs), name="partial", patience=3)
    import csv as _csv

    rows = list(_csv.DictReader(open(runs / "partial" / "results.csv")))
    assert rows and np.isfinite(float(rows[-1]["train/box_loss"]))


def test_full_workflow_chain(shapes_ds, tmp_path_factory):
    """The reference's canonical workflow smoke (test_python.py:230): ONE
    model instance through train -> val -> predict -> export -> AutoBackend
    reload, asserting each stage consumes the previous stage's artifact."""
    import jax.numpy as jnp

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.nn.autobackend import AutoBackend

    runs = tmp_path_factory.mktemp("wf")
    m = YOLO("yolo11n.yaml")
    m.train(data=str(shapes_ds), epochs=1, imgsz=96, batch=4, nbs=4, val=False,
            plots=False, workers=0, mosaic=0.0, warmup_epochs=0,
            project=str(runs), name="t")
    res = m.val(data=str(shapes_ds), imgsz=96, batch=4, plots=False)
    assert "metrics/mAP50-95(B)" in res
    img_dir = Path(str(shapes_ds)).parent / "images" / "val"
    preds = m.predict(str(img_dir), imgsz=96, conf=0.001, verbose=False)
    assert len(preds) >= 2
    out = m.export(format="stablehlo", imgsz=96, project=str(runs), name="exp")
    ab = AutoBackend(str(out))
    y = ab(jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert np.asarray(y).ndim == 3
    # reloading the trained checkpoint reproduces the facade surface
    # (best.msgpack only exists when in-loop val improves fitness; this run
    # trained with val=False, so last.msgpack is the artifact)
    m2 = YOLO(str(runs / "t" / "last.msgpack"))
    assert m2.model.nc == m.model.nc


def test_autobatch_resolves_batch_minus_one(shapes_ds, tmp_path_factory):
    """batch=-1 routes through the compile-time HBM estimate (reference
    engine/trainer.py:282-283 -> autobatch.py:14); the resolved batch is a
    sane positive candidate recorded in args.yaml."""
    import yaml

    runs = tmp_path_factory.mktemp("runs_ab")
    m = YOLO("yolo11n.yaml")
    m.model = DetectionModel("yolo11n.yaml", nc=3)
    m.train(data=str(shapes_ds), epochs=1, imgsz=96, batch=-1, nbs=4, val=False,
            plots=False, close_mosaic=0, amp=False, workers=0, mosaic=0.0,
            project=str(runs), name="ab", patience=5)
    saved = yaml.safe_load((runs / "ab" / "args.yaml").read_text())
    assert int(saved["batch"]) in (1, 2, 4, 8, 16, 32, 64)
    assert int(saved["batch"]) >= 1


def test_autobatch_estimator_direct():
    """The estimator itself: monotone fit under a tight budget and a loud
    error when nothing fits."""
    import pytest as _pytest

    from edgeyolo_tpu.utils.profiling import autobatch, memory_analysis

    m = DetectionModel("yolo11n.yaml", nc=3)
    m.init(0, imgsz=64, batch=1)
    import jax
    import jax.numpy as jnp

    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    mem = memory_analysis(lambda img: m.net.apply(m.variables, img, train=False)["pred"], x)
    peak1 = mem["peak_bytes"]
    assert peak1 > 0
    # generous budget picks a batch >= 2; a budget below b=1's peak raises
    b = autobatch(m, imgsz=64, fraction=1.0, hbm_bytes=64 * peak1,
                  candidates=(1, 2, 4))
    assert b >= 2
    with _pytest.raises(RuntimeError, match="autobatch"):
        autobatch(m, imgsz=64, fraction=1.0, hbm_bytes=max(peak1 // 100, 1),
                  candidates=(1, 2))


def test_pose_head_adapts_to_data_kpt_shape(tmp_path_factory):
    """A yaml-built pose model must rebuild its head to the DATASET's
    kpt_shape before training, like the reference PoseTrainer's
    get_model(..., data_kpt_shape=data['kpt_shape'])
    (models/yolo/pose/train.py:41). Regression: the facade adapted nc but
    left kpt_shape at the yaml's [17,3], so a 5-kpt dataset trained a 17-kpt
    head (pose loss/val silently zero)."""
    runs = tmp_path_factory.mktemp("runs_kpt")
    root = tmp_path_factory.mktemp("pose_kpt")
    data = generate_dataset(root, n_train=4, n_val=4, imgsz=96, nc=2, task="pose")
    m = YOLO("yolo11n-pose.yaml")
    assert tuple(m.model.yaml.get("kpt_shape", (17, 3))) == (17, 3)
    m.train(data=str(data), epochs=1, imgsz=96, batch=4, nbs=4, val=False,
            plots=False, close_mosaic=0, amp=False, workers=0,
            project=str(runs), name="kpt", patience=3)
    assert tuple(m.model.yaml["kpt_shape"]) == (5, 3)
    # the head's pose tower now emits K*D=15 channels
    from edgeyolo_tpu.engine.validator import PoseValidator
    from edgeyolo_tpu.cfg import get_cfg

    vargs = get_cfg(overrides={"mode": "val", "task": "pose", "data": str(data),
                               "imgsz": 96, "plots": False})
    res = PoseValidator(vargs, save_dir=runs / "val")(m.model, data=str(data))
    assert np.isfinite(res["metrics/mAP50-95(P)"])
