"""RandAugment for the classification train pipeline, TPU-native.

The reference's classify pipeline appends torchvision's RandAugment when
`auto_augment: randaugment` is set (reference data/augment.py:2403-2520,
classify_augmentations -> T.RandAugment; torchvision is NOT installed in
this image, so the reference itself cannot run this op here). This module
implements the torchvision tensor-path operator formulas in JAX — semantics
pinned by hand-computed cases and an independent numpy oracle in
tests/test_randaugment.py — composed with the standard policy: num_ops=2
sequential ops drawn uniformly from the 14-op space, magnitude 9 of 31
bins, signed where the op is directional, NEAREST resampling with zero fill
for the geometric ops (torchvision RandAugment defaults).

All ops take/return float images in [0, 1] (HWC). uint8-semantics ops
(posterize/solarize/equalize) quantize to the 0..255 grid internally, like
tensors that passed through ToTensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NUM_BINS = 31


# ---------------------------------------------------------------------------
# color ops (torchvision.transforms.functional tensor implementations)
# ---------------------------------------------------------------------------
def _rgb_to_gray(img):
    # torchvision rgb_to_grayscale weights
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.2989 * r + 0.587 * g + 0.114 * b


def _blend(img1, img2, ratio):
    """torchvision _blend: ratio*img1 + (1-ratio)*img2, clamped to [0,1]."""
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_saturation(img, factor):  # torchvision "Color"
    return _blend(img, _rgb_to_gray(img)[..., None], factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(_rgb_to_gray(img))
    return _blend(img, jnp.full_like(img, mean), factor)


def adjust_sharpness(img, factor):
    """torchvision _blurred_degenerate_image: 3x3 kernel [[1,1,1],[1,5,1],
    [1,1,1]]/13, blended only on the INTERIOR (border rows/cols keep the
    original pixels)."""
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    c = img.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    blur = jax.lax.conv_general_dilated(
        img[None], kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)[0]
    blur = jnp.clip(blur, 0.0, 1.0)
    h, w = img.shape[:2]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1))[..., None]
    blur = jnp.where(interior, blur, img)
    return _blend(img, blur, factor)


def posterize(img, bits):
    """Keep the top `bits` bits of the 0..255 quantization."""
    q = jnp.floor(img * 255.0 + 0.5).astype(jnp.int32)
    mask = -(1 << (8 - bits.astype(jnp.int32)))  # e.g. bits=4 -> 0xF0
    return (jnp.bitwise_and(q, mask)).astype(jnp.float32) / 255.0


def solarize(img, threshold01):
    return jnp.where(img >= threshold01, 1.0 - img, img)


def autocontrast(img):
    """Per-channel full-range stretch (torchvision autocontrast)."""
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip(jnp.where(hi > lo, (img - lo) * scale, img), 0.0, 1.0)


def equalize(img):
    """Per-channel histogram equalization, torchvision _scale_channel
    semantics on the 0..255 grid: step = (pixels - last_nonzero_count)//255,
    lut = clamp((cumsum(hist)+step//2)//step shifted by one, 0, 255); step==0
    leaves the channel untouched."""
    q = jnp.clip(jnp.floor(img * 255.0 + 0.5), 0, 255).astype(jnp.int32)

    def one_channel(ch):
        hist = jnp.zeros((256,), jnp.int32).at[ch.reshape(-1)].add(1)
        nz_idx = jnp.max(jnp.where(hist > 0, jnp.arange(256), -1))
        step = (hist.sum() - hist[nz_idx]) // 255
        cum = jnp.cumsum(hist)
        lut = (cum + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]]), 0, 255)
        out = lut[ch]
        return jnp.where(step == 0, ch, out)

    out = jnp.stack([one_channel(q[..., i]) for i in range(img.shape[-1])], axis=-1)
    return out.astype(jnp.float32) / 255.0


# ---------------------------------------------------------------------------
# geometric ops: inverse-affine + NEAREST sample, zero fill (RandAugment
# defaults: InterpolationMode.NEAREST, fill 0), rotation about the center
# ---------------------------------------------------------------------------
def _affine_nearest(img, inv):
    """Sample img at inv @ (x_out, y_out, 1), nearest neighbor, 0 fill.
    inv maps CENTER-ORIGIN output coords to center-origin input coords
    (torchvision applies the affine about the image center)."""
    h, w = img.shape[:2]
    cy, cx = (h - 1) * 0.5, (w - 1) * 0.5
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2] + cx
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2] + cy
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    val = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(ok[..., None], val, 0.0)


def shear_x(img, deg):
    t = jnp.tan(jnp.deg2rad(deg))
    inv = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) \
        .at[0, 1].set(t)  # forward shear matrix [[1,-tan],[0,1]] inverted
    return _affine_nearest(img, inv)


def shear_y(img, deg):
    t = jnp.tan(jnp.deg2rad(deg))
    inv = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[1, 0].set(t)
    return _affine_nearest(img, inv)


def translate_x(img, px):
    inv = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[0, 2].set(-px)
    return _affine_nearest(img, inv)


def translate_y(img, px):
    inv = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[1, 2].set(-px)
    return _affine_nearest(img, inv)


def rotate(img, deg):
    a = jnp.deg2rad(deg)
    cos, sin = jnp.cos(a), jnp.sin(a)
    # inverse of a CCW rotation about the center
    inv = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    inv = inv.at[0, 0].set(cos).at[0, 1].set(sin).at[1, 0].set(-sin).at[1, 1].set(cos)
    return _affine_nearest(img, inv)


# ---------------------------------------------------------------------------
# policy
# ---------------------------------------------------------------------------
def _magnitudes(size: int):
    """torchvision RandAugment._augmentation_space bins (num_bins=31)."""
    bins = NUM_BINS
    return {
        "shear": np.linspace(0.0, 0.3, bins),
        "translate": np.linspace(0.0, 150.0 / 331.0 * size, bins),
        "rotate": np.linspace(0.0, 30.0, bins),
        "color": np.linspace(0.0, 0.9, bins),
        "posterize": 8 - np.round(np.arange(bins) / (bins - 1) * 4),
        "solarize": np.linspace(255.0, 0.0, bins),
    }


def rand_augment(img, key, num_ops: int = 2, magnitude: int = 9):
    """Apply RandAugment to ONE (S,S,3) float image in [0,1]."""
    size = img.shape[0]
    mags = _magnitudes(size)
    shear_m = float(mags["shear"][magnitude])
    trans_m = float(mags["translate"][magnitude])
    rot_m = float(mags["rotate"][magnitude])
    col_m = float(mags["color"][magnitude])
    post_b = float(mags["posterize"][magnitude])
    sol_t = float(mags["solarize"][magnitude]) / 255.0

    # shear magnitudes enter torchvision's affine as degrees(atan(m))
    shear_deg = float(np.degrees(np.arctan(shear_m)))

    branches = [
        lambda im, s: im,                                                # Identity
        lambda im, s: shear_x(im, s * shear_deg),                        # ShearX
        lambda im, s: shear_y(im, s * shear_deg),                        # ShearY
        lambda im, s: translate_x(im, s * trans_m),                      # TranslateX
        lambda im, s: translate_y(im, s * trans_m),                      # TranslateY
        lambda im, s: rotate(im, s * rot_m),                             # Rotate
        lambda im, s: adjust_brightness(im, 1.0 + s * col_m),            # Brightness
        lambda im, s: adjust_saturation(im, 1.0 + s * col_m),            # Color
        lambda im, s: adjust_contrast(im, 1.0 + s * col_m),              # Contrast
        lambda im, s: adjust_sharpness(im, 1.0 + s * col_m),             # Sharpness
        lambda im, s: posterize(im, jnp.asarray(post_b)),                # Posterize
        lambda im, s: solarize(im, sol_t),                               # Solarize
        lambda im, s: autocontrast(im),                                  # AutoContrast
        lambda im, s: equalize(im),                                      # Equalize
    ]

    for i in range(num_ops):
        ko = jax.random.fold_in(key, 2 * i)
        ks = jax.random.fold_in(key, 2 * i + 1)
        op = jax.random.randint(ko, (), 0, len(branches))
        sign = jnp.where(jax.random.uniform(ks, ()) < 0.5, -1.0, 1.0)
        img = jax.lax.switch(op, branches, img, sign)
    return img


def rand_augment_batch(img01, key, num_ops: int = 2, magnitude: int = 9):
    """vmapped RandAugment over a (B,S,S,3) float batch."""
    keys = jax.random.split(key, img01.shape[0])
    return jax.vmap(lambda im, k: rand_augment(im, k, num_ops, magnitude))(img01, keys)
