"""RandAugment operator semantics (data/randaugment.py) vs hand math and an
independent numpy oracle for the uint8-grid ops. torchvision is absent from
this image (the reference cannot run its own RandAugment here), so the pin
is against the documented tensor-path formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.data import randaugment as R

RNG = np.random.RandomState(0)
IMG = jnp.asarray(RNG.rand(16, 12, 3).astype(np.float32))


def test_brightness_contrast_saturation_blend():
    np.testing.assert_allclose(np.asarray(R.adjust_brightness(IMG, 0.5)),
                               np.asarray(IMG) * 0.5, atol=1e-6)
    out = np.asarray(R.adjust_saturation(IMG, 0.0))  # factor 0 -> pure gray
    g = 0.2989 * np.asarray(IMG)[..., 0] + 0.587 * np.asarray(IMG)[..., 1] \
        + 0.114 * np.asarray(IMG)[..., 2]
    np.testing.assert_allclose(out, np.repeat(g[..., None], 3, -1), atol=1e-6)
    out = np.asarray(R.adjust_contrast(IMG, 0.0))  # factor 0 -> flat mean
    np.testing.assert_allclose(out, np.full_like(out, g.mean()), atol=1e-6)


def test_sharpness_border_preserved():
    out = np.asarray(R.adjust_sharpness(IMG, 0.0))  # fully blurred interior
    a = np.asarray(IMG)
    np.testing.assert_allclose(out[0], a[0], atol=1e-6)   # border rows intact
    np.testing.assert_allclose(out[:, -1], a[:, -1], atol=1e-6)
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    i, j = 5, 5
    want = (a[i - 1 : i + 2, j - 1 : j + 2] * k[..., None]).sum((0, 1))
    np.testing.assert_allclose(out[i, j], np.clip(want, 0, 1), atol=1e-6)


def test_posterize_bits():
    img = jnp.asarray(np.array([[[200 / 255.0, 77 / 255.0, 3 / 255.0]]], np.float32))
    out = np.asarray(R.posterize(img, jnp.asarray(4.0))) * 255
    np.testing.assert_allclose(out[0, 0], [200 & 0xF0, 77 & 0xF0, 3 & 0xF0], atol=1e-4)


def test_solarize_and_autocontrast():
    out = np.asarray(R.solarize(IMG, 0.5))
    a = np.asarray(IMG)
    np.testing.assert_allclose(out, np.where(a >= 0.5, 1.0 - a, a), atol=1e-6)
    out = np.asarray(R.autocontrast(IMG))
    for c in range(3):
        assert abs(out[..., c].min()) < 1e-6 and abs(out[..., c].max() - 1.0) < 1e-6


def _equalize_oracle(q):
    """Independent numpy port of torchvision's uint8 _scale_channel."""
    out = np.empty_like(q)
    for c in range(q.shape[-1]):
        ch = q[..., c]
        hist = np.bincount(ch.reshape(-1), minlength=256)
        nz = np.nonzero(hist)[0]
        step = (hist.sum() - hist[nz[-1]]) // 255
        if step == 0:
            out[..., c] = ch
            continue
        lut = (np.cumsum(hist) + step // 2) // step
        lut = np.clip(np.concatenate([[0], lut[:-1]]), 0, 255)
        out[..., c] = lut[ch]
    return out


def test_equalize_matches_numpy_oracle():
    q = (np.asarray(IMG) * 255 + 0.5).astype(np.int32).clip(0, 255)
    want = _equalize_oracle(q)
    got = (np.asarray(R.equalize(IMG)) * 255 + 0.5).astype(np.int32)
    np.testing.assert_array_equal(got, want)
    # constant image (step 0) passes through
    flat = jnp.full((8, 8, 3), 0.42)
    np.testing.assert_allclose(np.asarray(R.equalize(flat)), np.asarray(flat), atol=2e-3)


def test_geometric_translate_rotate():
    img = np.zeros((9, 9, 3), np.float32)
    img[4, 4] = 1.0  # center delta
    t = np.asarray(R.translate_x(jnp.asarray(img), 2.0))
    assert t[4, 6, 0] == 1.0 and t[4, 4, 0] == 0.0
    r = np.asarray(R.rotate(jnp.asarray(img), 90.0))
    assert r[4, 4, 0] == 1.0  # center fixed under rotation
    img2 = np.zeros((9, 9, 3), np.float32)
    img2[4, 6] = 1.0  # +2 in x from center
    r2 = np.asarray(R.rotate(jnp.asarray(img2), 90.0))
    assert r2.sum() > 0  # mass survives (lands on one nearest pixel)
    # zero fill outside
    t2 = np.asarray(R.translate_x(jnp.asarray(img), 6.0))
    assert t2[:, :6].sum() == 0.0


def test_policy_runs_and_stays_in_range():
    key = jax.random.PRNGKey(0)
    batch = jnp.asarray(RNG.rand(6, 24, 24, 3).astype(np.float32))
    out = R.rand_augment_batch(batch, key)
    assert out.shape == batch.shape
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= -1e-6 and o.max() <= 1 + 1e-6
    # different keys give different augmentations
    out2 = R.rand_augment_batch(batch, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_classify_pipeline_applies_randaugment():
    from edgeyolo_tpu.data.augment_device import classify_augment_batch

    imgs = (RNG.rand(4, 32, 32, 3) * 255).astype(np.uint8)
    hyp = {"scale": 0.0, "fliplr": 0.0, "flipud": 0.0, "hsv_h": 0, "hsv_s": 0,
           "hsv_v": 0, "erasing": 0.0}
    base = np.asarray(classify_augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(3), hyp))
    ra = np.asarray(classify_augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(3),
                                           dict(hyp, auto_augment="randaugment")))
    assert not np.allclose(base, ra)  # the policy engaged
    assert np.isfinite(ra).all()
