"""Task-predictor surface: segment/pose/obb predict must emit Results with
masks/keypoints/obb containers (reference models/yolo/{segment,pose,obb}/
predict.py), plus masks2segments and the auto-annotator."""

import numpy as np
import pytest

from edgeyolo_tpu import YOLO
from edgeyolo_tpu.ops.segments import _numpy_outline, masks2segments


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (80, 112, 3), np.uint8)  # non-square: letterbox path
    a[20:60, 30:80] = [250, 40, 40]
    Image.fromarray(a).save(d / "a.jpg")
    return d


def _init_predict(name, img_dir, **kw):
    m = YOLO(name)
    m.model.init(0, imgsz=64)
    return m.predict(str(img_dir), imgsz=64, conf=0.0, verbose=False, **kw)


def test_segment_predict_emits_masks(img_dir):
    res = _init_predict("yolo11n-seg.yaml", img_dir)
    r = res[0]
    assert r.boxes is not None and len(r.boxes) > 0  # conf=0: something survives
    assert r.masks is not None and len(r.masks) == len(r.boxes)
    assert r.masks.data.shape[1:] == r.orig_shape
    assert r.masks.data.dtype == bool
    segs = r.masks.xyn
    assert len(segs) == len(r.boxes)


def test_segment_save_txt_polygon_format(tmp_path):
    from edgeyolo_tpu.engine.results import Results

    img = np.zeros((40, 60, 3), np.uint8)
    mask = np.zeros((1, 40, 60), bool)
    mask[0, 10:30, 12:40] = True
    boxes = np.asarray([[12, 10, 40, 30, 0.9, 2]], np.float32)
    r = Results(img, "x.jpg", {2: "c"}, boxes=boxes, masks=mask)
    txt = tmp_path / "labels.txt"
    r.save_txt(txt, save_conf=True)
    parts = txt.read_text().splitlines()[0].split()
    assert parts[0] == "2" and abs(float(parts[-1]) - 0.9) < 1e-5
    xy = np.asarray([float(v) for v in parts[1:-1]]).reshape(-1, 2)
    assert len(xy) >= 4 and (xy >= 0).all() and (xy <= 1).all()


def test_pose_predict_emits_keypoints(img_dir):
    res = _init_predict("yolo11n-pose.yaml", img_dir)
    r = res[0]
    assert r.boxes is not None and len(r.boxes) > 0
    assert r.keypoints is not None and r.keypoints.data.shape[1:] == (17, 3)
    h, w = r.orig_shape
    xyn = r.keypoints.xyn
    assert xyn.shape == (len(r.boxes), 17, 2)
    assert r.keypoints.conf is not None


def test_obb_predict_emits_rotated_boxes(img_dir):
    res = _init_predict("yolo11n-obb.yaml", img_dir)
    r = res[0]
    assert r.obb is not None and len(r.obb) > 0
    corners = r.obb.xyxyxyxy
    assert corners.shape == (len(r.obb), 4, 2)
    # corner polygon must be consistent with xywhr: centroid == (cx, cy)
    np.testing.assert_allclose(corners.mean(1), r.obb.xywhr[:, :2], atol=1e-3)
    # envelope contains all corners
    env = r.obb.xyxy
    assert (corners[..., 0] >= env[:, None, 0] - 1e-4).all()
    assert (corners[..., 0] <= env[:, None, 2] + 1e-4).all()
    assert r.plot().shape == (*r.orig_shape, 3)


def test_masks2segments_square():
    m = np.zeros((1, 32, 32), bool)
    m[0, 8:24, 4:20] = True
    (seg,) = masks2segments(m)
    assert seg.shape[0] >= 4
    assert seg[:, 0].min() >= 3 and seg[:, 0].max() <= 20
    assert seg[:, 1].min() >= 7 and seg[:, 1].max() <= 24


def test_numpy_outline_matches_mask_extent():
    m = np.zeros((24, 24), bool)
    m[5:15, 6:18] = True
    pts = _numpy_outline(m)
    assert pts.shape[0] >= 4
    assert pts[:, 0].min() == 6 and pts[:, 0].max() == 17
    assert pts[:, 1].min() == 5 and pts[:, 1].max() == 14


def test_auto_annotate_writes_polygon_txt(img_dir, tmp_path):
    from edgeyolo_tpu.data.annotator import auto_annotate
    from edgeyolo_tpu.engine.model import YOLO as Y

    det = Y("yolo11n.yaml")
    det.model.init(0, imgsz=64)
    out = auto_annotate(img_dir, det_model=det, conf=0.0, imgsz=64,
                        output_dir=tmp_path / "labels", sam_img_size=128)
    txts = list(out.glob("*.txt"))
    assert txts, "no annotation files written"
    parts = txts[0].read_text().split()
    assert parts[0].isdigit() and len(parts) >= 7
    vals = np.asarray([float(v) for v in parts[1:]])
    assert (vals >= -0.01).all() and (vals <= 1.01).all()


def test_top_level_exports():
    import edgeyolo_tpu as e

    for n in e.__all__:
        assert getattr(e, n) is not None
