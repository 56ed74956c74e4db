"""Facade-train smoke: one real `YOLO(cfg).train()` epoch per task_map family.

This is the test tier that catches criterion-dispatch breaks the module-level
train-step tests cannot see: test_family_train_steps.py constructs the
criterion itself and thus bypasses `BaseTrainer._build_criterion` /
`head_is_dict_loss` — exactly how the round-4 E2E regression (every end2end
model crashing with `E2EDetectLoss.__call__() takes 3 positional arguments
but 4 were given`) shipped. Here the ONLY entry point is the public facade,
so the trainer's own dispatch runs for every family.

Behavioral spec: reference tests/test_python.py:205 (test_train_scratch over
the zoo) + reference nn/tasks.py:411-413 (end2end keys E2EDetectLoss).
"""

import pytest

from edgeyolo_tpu import YOLO
from edgeyolo_tpu.data.synthetic import generate_classify_dataset, generate_dataset

# (cfg, task) — covers every criterion-dispatch branch in
# BaseTrainer._build_criterion + head_is_dict_loss:
#   detect plain / detect GF-quality / end2end v10 / end2end EdgeLine /
#   segment / pose / obb / classify / rtdetr
FAMILIES = [
    ("yolo11n.yaml", "detect"),
    ("edgeline-yolo.yaml", "detect"),       # GFLHeadv2_uniH quality hook
    ("yolov10n.yaml", "detect"),            # v10Detect: end2end attr, no "E2E" in name
    ("yolov8-test.yaml", "detect"),         # EdgeLine E2EDetect head
    ("yolo11n-seg.yaml", "segment"),
    ("yolo11n-pose.yaml", "pose"),
    ("yolo11n-obb.yaml", "obb"),
    ("yolo11n-cls.yaml", "classify"),
]
HEAVY = [
    ("rtdetr-l.yaml", "detect"),            # RTDETRDetectionLoss + CDN branch
]


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    out = {}
    for task in ("detect", "segment", "pose", "obb"):
        root = tmp_path_factory.mktemp(f"smoke_{task}")
        out[task] = generate_dataset(root, n_train=4, n_val=2, imgsz=64, nc=2,
                                     max_objs=2, task=task)
    croot = tmp_path_factory.mktemp("smoke_cls")
    out["classify"] = generate_classify_dataset(croot, nc=2, n_train_per_class=2,
                                                n_val_per_class=1,
                                                size_range=(60, 70))
    return out


def _train_one(cfg, task, tiny_ds, tmp_path, **kw):
    m = YOLO(cfg)
    m.train(data=str(tiny_ds[task]), epochs=1, imgsz=64, batch=2, nbs=2,
            val=False, plots=False, amp=False, workers=0, mosaic=0.0,
            close_mosaic=0, warmup_epochs=0, project=str(tmp_path),
            name="smoke", exist_ok=True, photometric=0.0, **kw)
    run = tmp_path / "smoke"
    assert (run / "last.msgpack").exists(), f"{cfg}: no checkpoint written"
    csv = (run / "results.csv").read_text()
    assert csv.count("\n") >= 2, f"{cfg}: results.csv empty"
    return m


@pytest.mark.parametrize("cfg,task", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_facade_train_one_epoch(cfg, task, tiny_ds, tmp_path):
    _train_one(cfg, task, tiny_ds, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("cfg,task", HEAVY, ids=[f[0] for f in HEAVY])
def test_facade_train_one_epoch_heavy(cfg, task, tiny_ds, tmp_path):
    _train_one(cfg, task, tiny_ds, tmp_path)
