"""Native C++ IO runtime (edgeyolo_tpu/native): libjpeg decode + letterbox,
pixel-equivalent to the PIL path, threaded batch API, dataset wiring."""

import io

import numpy as np
import pytest
from PIL import Image

from edgeyolo_tpu import native


def _jpeg(shape=(480, 640, 3), seed=0, quality=92):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, shape, np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality)
    return b.getvalue()


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain/libjpeg unavailable")


@needs_native
def test_native_matches_pil_letterbox():
    from edgeyolo_tpu.data.letterbox import letterbox

    data = _jpeg()
    for imgsz, scaleup in ((320, True), (640, True), (96, False)):
        out, r, (pw, ph), (h0, w0) = native.decode_letterbox(data, imgsz, scaleup)
        ref_img = np.asarray(Image.open(io.BytesIO(data)))
        ref, r2, (pw2, ph2) = letterbox(ref_img, imgsz, scaleup=scaleup)
        assert (h0, w0) == ref_img.shape[:2]
        assert abs(r - r2) < 1e-9 and (pw, ph) == (pw2, ph2)
        diff = np.abs(out.astype(int) - ref.astype(int))
        if imgsz >= 320:  # no DCT prescale kicks in: pixel-equal modulo rounding
            assert diff.mean() < 0.5 and diff.max() <= 2, (imgsz, diff.mean(), diff.max())
        else:
            # heavy downscale uses DCT-domain 1/2 prescale (an exact DCT
            # decimation, properly antialiased) before the triangle filter —
            # not bit-equal to PIL's full-decode path but visually identical
            assert diff.mean() < 1.5 and diff.max() <= 8, (imgsz, diff.mean(), diff.max())


@needs_native
def test_native_batch_decode():
    blobs = [_jpeg(seed=i, shape=(200 + 30 * i, 300, 3)) for i in range(5)]
    imgs, metas = native.decode_letterbox_batch(blobs, 128, threads=3)
    assert imgs.shape == (5, 128, 128, 3)
    for (h0, w0, r, (pw, ph)), blob in zip(metas, blobs):
        assert w0 == 300 and 200 <= h0 <= 320
        single, r1, (pw1, ph1), _ = native.decode_letterbox(blob, 128)
        assert r == r1 and (pw, ph) == (pw1, ph1)
    np.testing.assert_array_equal(imgs[0], native.decode_letterbox(blobs[0], 128)[0])


@needs_native
def test_dataset_native_path_matches_pil(tmp_path, monkeypatch):
    import edgeyolo_tpu.data.dataset as ds_mod

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (100, 140, 3), np.uint8)).save(
            img_dir / f"{i}.jpg", quality=95)
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

    monkeypatch.setenv("EDGEYOLO_NATIVE_IO", "1")
    monkeypatch.setattr(ds_mod, "_NATIVE_IO", None)
    ds_n = ds_mod.YOLODataset(str(img_dir), imgsz=96, augment=False, names={0: "x"})
    it_n = ds_n.get_item(0)

    monkeypatch.setenv("EDGEYOLO_NATIVE_IO", "0")
    monkeypatch.setattr(ds_mod, "_NATIVE_IO", None)
    ds_p = ds_mod.YOLODataset(str(img_dir), imgsz=96, augment=False, names={0: "x"})
    it_p = ds_p.get_item(0)
    monkeypatch.setattr(ds_mod, "_NATIVE_IO", None)

    assert it_n["ratio_pad"] == it_p["ratio_pad"]
    assert it_n["ori_shape"] == it_p["ori_shape"]
    diff = np.abs(it_n["img"].astype(int) - it_p["img"].astype(int))
    assert diff.mean() < 0.5 and diff.max() <= 2
    np.testing.assert_array_equal(it_n["bboxes"], it_p["bboxes"])


def test_native_gates_cleanly(monkeypatch):
    """When the module is unavailable the API raises, and the dataset falls
    back to PIL without error."""
    if native.available():
        pytest.skip("native available; fallback covered by env=0 path above")
    with pytest.raises(RuntimeError):
        native.decode_letterbox(b"xx", 64)
