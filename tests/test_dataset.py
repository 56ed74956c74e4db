"""Dataset-level behaviors: rect val batching (aspect-sorted, per-batch
quantized canvas shapes — reference base.py:261-279) and loader invariants."""

import numpy as np
import pytest
from PIL import Image

from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader


@pytest.fixture(scope="module")
def mixed_ar_ds(tmp_path_factory):
    """6 images: 2 wide (3:1? no — h<w), 2 square, 2 tall, each with one box."""
    root = tmp_path_factory.mktemp("rectds")
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    shapes = [(60, 120), (64, 128), (100, 100), (96, 96), (120, 60), (128, 64)]
    for i, (h, w) in enumerate(shapes):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(img_dir / f"{i}.jpg")
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    return img_dir


def test_set_rectangle_sorts_and_buckets(mixed_ar_ds):
    ds = YOLODataset(str(mixed_ar_ds), imgsz=128, augment=False, names={0: "x"})
    ds.set_rectangle(batch_size=2)
    # sorted ascending by aspect ratio h/w: wide first, tall last
    shapes = ds._rect_shape
    assert shapes[0][0] <= shapes[-1][0] or shapes[0][1] >= shapes[-1][1]
    # each shape is a multiple of 64 and no side exceeds ceil-quantized imgsz
    for h, w in shapes:
        assert h % 64 == 0 and w % 64 == 0
        assert max(h, w) == 128  # long side pinned to imgsz
    # wide images got a short canvas, tall images a narrow canvas
    assert shapes[0] == (64, 128)
    assert shapes[-1] == (128, 64)


def test_rect_batches_are_shape_homogeneous(mixed_ar_ds):
    ds = YOLODataset(str(mixed_ar_ds), imgsz=128, augment=False, names={0: "x"})
    ds.set_rectangle(batch_size=2)
    loader = build_dataloader(ds, 2, shuffle=False)
    seen_shapes = set()
    for batch in loader:
        assert batch["img"].ndim == 4
        seen_shapes.add(batch["img"].shape[1:3])
    assert len(seen_shapes) >= 2  # genuinely different canvas shapes


def test_rect_labels_land_in_canvas(mixed_ar_ds):
    ds = YOLODataset(str(mixed_ar_ds), imgsz=128, augment=False, names={0: "x"})
    ds.set_rectangle(batch_size=2)
    for i in range(len(ds)):
        it = ds.get_item(i)
        H, W = it["img"].shape[:2]
        b = it["bboxes"][it["mask_gt"] > 0]
        assert (b >= 0).all() and (b <= 1).all()
        # centered 0.4x0.4 box stays centered after letterbox
        assert abs(b[0, 0] - 0.5) < 0.05 and abs(b[0, 1] - 0.5) < 0.05


def test_square_default_unchanged(mixed_ar_ds):
    ds = YOLODataset(str(mixed_ar_ds), imgsz=128, augment=False, names={0: "x"})
    it = ds.get_item(0)
    assert it["img"].shape == (128, 128, 3)


def test_corrupt_images_dropped(tmp_path):
    """verify_image_label parity: corrupt/undersized files drop with a
    warning instead of crashing the loader (reference data/utils.py:97)."""
    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(img_dir / f"ok{i}.jpg")
        (lbl_dir / f"ok{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (img_dir / "broken.jpg").write_bytes(b"\xff\xd8\xff\xe0 garbage not jpeg")
    Image.fromarray(rng.randint(0, 255, (4, 4, 3), np.uint8)).save(img_dir / "tiny.png")
    ds = YOLODataset(str(img_dir), imgsz=64, augment=False, names={0: "x"})
    assert len(ds) == 3
    assert all("ok" in f for f in ds.im_files)


def test_min_area_rect_skewed_quad():
    """_poly2rbox is a true min-area rect (rotating calipers), covering
    skewed DOTA quads exactly (reference uses cv2.minAreaRect)."""
    from edgeyolo_tpu.data.dataset import _poly2rbox

    pts = np.asarray([[0.1, 0.1], [0.6, 0.15], [0.65, 0.5], [0.12, 0.42]])
    cx, cy, w, h, a = _poly2rbox(pts)
    R = np.asarray([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
    q = (pts - [cx, cy]) @ R.T
    assert (np.abs(q[:, 0]) <= w / 2 + 1e-6).all()
    assert (np.abs(q[:, 1]) <= h / 2 + 1e-6).all()
    # exact for a rotated square
    sq = np.asarray([[0.5, 0.3], [0.7, 0.5], [0.5, 0.7], [0.3, 0.5]])
    r = _poly2rbox(sq)
    assert abs(r[2] - 0.2 * np.sqrt(2)) < 1e-5 and abs(r[3] - 0.2 * np.sqrt(2)) < 1e-5


def test_label_parsing_keeps_instance_arrays_aligned(tmp_path):
    """Mixed/invalid lines must never desynchronize cls vs segments/keypoints
    (a rejected line used to pop a PREVIOUS valid keypoint; box-only lines in
    a segment file used to leave the segments list short)."""
    from PIL import Image

    from edgeyolo_tpu.data.dataset import YOLODataset

    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    (d / "labels").mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "images" / "a.jpg")

    K = 3
    kpt_line = "0 0.5 0.5 0.2 0.2 " + " ".join(["0.5 0.5 2"] * K)
    box_line = "1 0.3 0.3 0.1 0.1"
    bad_line = "2 0.5 0.5 -0.1 0.2"  # invalid box -> dropped
    (d / "labels" / "a.txt").write_text("\n".join([kpt_line, bad_line, box_line]) + "\n")
    ds = YOLODataset(str(d / "images"), imgsz=32, augment=False, task="pose", kpt_shape=(K, 3))
    lab = ds.labels[0]
    assert len(lab["cls"]) == 2 and len(lab["keypoints"]) == 2
    assert lab["keypoints"][0, 0, 2] == 2  # line 1's kpts survived the bad line
    assert (lab["keypoints"][1] == 0).all()  # box-only line -> zero kpts

    poly_line = "0 0.2 0.2 0.8 0.2 0.8 0.8 0.2 0.8"
    (d / "labels" / "a.txt").write_text("\n".join([poly_line, box_line]) + "\n")
    ds2 = YOLODataset(str(d / "images"), imgsz=32, augment=False, task="segment")
    lab2 = ds2.labels[0]
    assert len(lab2["cls"]) == 2 and len(lab2["segments"]) == 2
    assert len(lab2["segments"][1]) == 4  # box corners polygon


def test_filter_classes_keeps_segments_aligned(tmp_path):
    from PIL import Image

    from edgeyolo_tpu.data.dataset import YOLODataset

    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    (d / "labels").mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "images" / "a.jpg")
    lines = ["0 0.1 0.1 0.2 0.1 0.2 0.2 0.1 0.2",   # class 0 polygon (low corner)
             "2 0.6 0.6 0.9 0.6 0.9 0.9 0.6 0.9"]   # class 2 polygon (high corner)
    (d / "labels" / "a.txt").write_text("\n".join(lines) + "\n")
    ds = YOLODataset(str(d / "images"), imgsz=32, augment=False, task="segment", classes=[2])
    lab = ds.labels[0]
    assert len(lab["cls"]) == 1 and int(lab["cls"][0]) == 2
    assert len(lab["segments"]) == 1
    assert lab["segments"][0][:, 0].min() > 0.5  # the class-2 polygon, not class-0


def test_obb_rboxes_letterbox_and_pixel_fit(tmp_path):
    """Rotated gt fitting must happen in pixel space and map through the
    letterbox: normalized-space fits distort w/h/angle on non-square images."""
    from PIL import Image

    from edgeyolo_tpu.data.dataset import YOLODataset

    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    (d / "labels").mkdir(parents=True)
    w0, h0 = 128, 64  # non-square
    Image.fromarray(np.zeros((h0, w0, 3), np.uint8)).save(d / "images" / "a.jpg")
    # a 45-degree square, side 16 px, centered at (64, 32): corners in pixels
    c = np.asarray([64.0, 32.0])
    s = 16 / np.sqrt(2)
    corners_px = np.asarray([[c[0], c[1] - s], [c[0] + s, c[1]],
                             [c[0], c[1] + s], [c[0] - s, c[1]]])
    poly_n = corners_px / np.asarray([w0, h0])
    line = "0 " + " ".join(f"{v:.6f}" for v in poly_n.reshape(-1))
    (d / "labels" / "a.txt").write_text(line + "\n")
    ds = YOLODataset(str(d / "images"), imgsz=64, augment=False, task="obb")
    item = ds.get_item(0)
    rb_ori = item["rboxes_ori"][0]
    # pixel-space fit: a rotated SQUARE must come out with w == h == 16
    np.testing.assert_allclose(rb_ori[2], 16.0, atol=0.5)
    np.testing.assert_allclose(rb_ori[3], 16.0, atol=0.5)
    np.testing.assert_allclose(rb_ori[:2], c, atol=0.5)
    # letterbox-frame rboxes roundtrip: *W/*H must recover r-scaled extents
    H, W = item["img"].shape[:2]
    r, (pw, ph) = item["ratio_pad"]
    rb = item["rboxes"][0]
    np.testing.assert_allclose(rb[2] * W, 16.0 * r, atol=0.5)
    np.testing.assert_allclose(rb[3] * H, 16.0 * r, atol=0.5)
    np.testing.assert_allclose(rb[0] * W, c[0] * r + pw, atol=0.5)
    np.testing.assert_allclose(rb[1] * H, c[1] * r + ph, atol=0.5)


def test_loader_surfaces_producer_exceptions(tmp_path):
    """A decode failure mid-epoch must raise on the consumer, not hang it."""
    from PIL import Image

    from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader

    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    for i in range(3):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "images" / f"{i}.jpg")
    ds = YOLODataset(str(d / "images"), imgsz=32, augment=False)
    orig = ds.get_item

    def boom(i):
        if i == 2:
            raise RuntimeError("decode failed")
        return orig(i)

    ds.get_item = boom
    loader = build_dataloader(ds, 1, shuffle=False)
    with pytest.raises(RuntimeError, match="decode failed"):
        for _ in loader:
            pass


def test_dataloader_process_sharding(tmp_path):
    """Multi-host loader contract: same-seed shuffles, disjoint equal-length
    strides, truncated so every host sees the same batch count."""
    from PIL import Image

    from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader

    d = tmp_path / "ds"
    (d / "images").mkdir(parents=True)
    for i in range(11):  # odd: forces truncation
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "images" / f"{i:02d}.jpg")
    ds = YOLODataset(str(d / "images"), imgsz=32, augment=False)
    l0 = build_dataloader(ds, 2, shuffle=True, seed=7, shard_rank=0, shard_count=2)
    l1 = build_dataloader(ds, 2, shuffle=True, seed=7, shard_rank=1, shard_count=2)
    i0, i1 = l0._indices(), l1._indices()
    assert len(i0) == len(i1) == 5  # 11 -> truncate to 10 -> 5 each
    assert not set(i0) & set(i1)
    assert len(l0) == len(l1) == 3  # ceil(5/2) batches, lockstep


def test_ram_cache_returns_identical_items(tmp_path):
    """cache=ram memoizes the decoded+letterboxed image (reference
    base.py:89-101); items are bit-identical to the uncached path."""
    import numpy as np

    from edgeyolo_tpu.data.dataset import YOLODataset
    from edgeyolo_tpu.data.synthetic import generate_dataset

    generate_dataset(tmp_path, n_train=4, n_val=2, imgsz=96, nc=3)
    names = {0: "a", 1: "b", 2: "c"}
    cold = YOLODataset(str(tmp_path / "images" / "train"), imgsz=96, names=names)
    warm = YOLODataset(str(tmp_path / "images" / "train"), imgsz=96, names=names,
                       cache="ram")
    for i in range(4):
        a, b = cold.get_item(i), warm.get_item(i)
        np.testing.assert_array_equal(a["img"], b["img"])
        np.testing.assert_array_equal(a["bboxes"], b["bboxes"])
    # second pass is served from the cache and stays identical
    for i in range(4):
        np.testing.assert_array_equal(warm.get_item(i)["img"],
                                      cold.get_item(i)["img"])
    assert len(warm._im_cache) == 4 and not cold._im_cache


def test_crowded_generator_nc8_names_and_density(tmp_path):
    """nc>3 gets unique (shape,color) class names; crowding knobs control
    instance count (the round-4 parity protocol's noise-floor lever)."""
    from edgeyolo_tpu.data.synthetic import class_names, generate_dataset

    names = class_names(8)
    assert len(set(names)) == 8
    y = generate_dataset(tmp_path, n_train=4, n_val=2, imgsz=128, nc=8,
                         min_objs=4, max_objs=6, min_size=0.08, max_size=0.2)
    txt = y.read_text()
    assert "nc: 8" in txt and names[7] in txt
    counts = [len((tmp_path / "labels" / "train" / f"train_{i:04d}.txt")
                  .read_text().strip().splitlines()) for i in range(4)]
    assert all(4 <= c <= 6 for c in counts)
    classes = set()
    for i in range(4):
        for ln in (tmp_path / "labels" / "train" / f"train_{i:04d}.txt").read_text().strip().splitlines():
            classes.add(int(ln.split()[0]))
    assert max(classes) >= 3  # classes beyond the old 3-name cap get drawn


def test_classify_grating_generator(tmp_path):
    """ImageFolder layout, non-square sizes, orientation-discriminable."""
    import numpy as np
    from PIL import Image

    from edgeyolo_tpu.data.synthetic import generate_classify_dataset

    root = generate_classify_dataset(tmp_path, nc=4, n_train_per_class=2,
                                     n_val_per_class=1)
    for split, n in (("train", 2), ("val", 1)):
        for c in range(4):
            files = sorted((root / split / f"grating_{c}").glob("*.jpg"))
            assert len(files) == n
            im = Image.open(files[0])
            assert im.size[0] != im.size[1]  # non-square
    # gratings of different classes differ in dominant orientation: the
    # energy of row-wise vs column-wise differences separates 0 vs 90 deg
    a = np.asarray(Image.open(next((root / "train" / "grating_0").glob("*.jpg"))).convert("L"), float)
    b = np.asarray(Image.open(next((root / "train" / "grating_2").glob("*.jpg"))).convert("L"), float)
    ratio_a = np.abs(np.diff(a, axis=1)).mean() / np.abs(np.diff(a, axis=0)).mean()
    ratio_b = np.abs(np.diff(b, axis=1)).mean() / np.abs(np.diff(b, axis=0)).mean()
    assert ratio_a > ratio_b  # class 0 varies along x; class 2 along y


def test_segment_masks_cv2_exact_and_exclusive(tmp_path):
    """GT instance masks must follow the reference's overlap_mask=True
    convention exactly (data/utils.py:250-296): cv2.fillPoly at full input
    resolution with int-truncated coords, cv2.resize to imgsz/4, then a
    merge drawn area-DESCENDING with clip so an overlapped pixel belongs to
    the smallest covering instance. PIL-fill boundary pixels moved mask IoUs
    of ~5px proto-res instances across whole mAP thresholds (round-4 segment
    parity); this pins the cv2 path + the exclusivity rule."""
    import numpy as np

    from edgeyolo_tpu.data.synthetic import generate_dataset
    from edgeyolo_tpu.data.dataset import YOLODataset

    data = generate_dataset(tmp_path, n_train=2, n_val=4, imgsz=320, nc=4,
                            min_objs=4, max_objs=8, min_size=0.08,
                            max_size=0.30, seed=3, task="segment")
    ds = YOLODataset(str(tmp_path / "images" / "val"), imgsz=320, augment=False,
                     names={i: str(i) for i in range(4)}, task="segment",
                     mask_ratio=4)
    cv2 = pytest.importorskip("cv2")
    saw_overlap = False
    for idx in range(len(ds)):
        item = ds.get_item(idx)
        segs = ds.labels[idx]["segments"]
        n = len(segs)
        m = item["masks"][:n]
        assert m.shape[1:] == (80, 80)
        # exclusivity: no pixel belongs to two instances
        assert (m.sum(0) <= 1.0 + 1e-6).all()
        # cv2-exact per-instance rasterization, pre-merge: the union of our
        # exclusive masks over any overlap region equals the union of the
        # independent cv2 rasterizations (merge only reassigns, never adds)
        full = np.zeros((n, 80, 80), np.uint8)
        for j, s in enumerate(segs):
            buf = np.zeros((320, 320), np.uint8)
            pts = np.stack([s[:, 0] * 320, s[:, 1] * 320], 1).astype(np.int32)
            cv2.fillPoly(buf, [pts], color=1)
            full[j] = cv2.resize(buf, (80, 80))
        assert ((m.sum(0) > 0) == (full.sum(0) > 0)).all()
        if (full.sum(0) > 1).any():
            saw_overlap = True
            # in an overlapped pixel, the smallest covering instance wins
            yy, xx = np.nonzero(full.sum(0) > 1)
            areas = full.reshape(n, -1).sum(1)
            for y, x in zip(yy[:32], xx[:32]):
                covering = np.nonzero(full[:, y, x])[0]
                winner = np.nonzero(m[:, y, x])[0]
                assert len(winner) == 1
                assert areas[winner[0]] == areas[covering].min()
    assert saw_overlap, "crowded generator should produce overlapping instances"
