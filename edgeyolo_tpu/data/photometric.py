"""Device-side photometric augmentation: the reference's Albumentations stage
and the Format-stage BGR channel swap, as fixed-shape jittable ops.

Reference behavior (ultralytics/data/augment.py):
- Albumentations list (augment.py:1845-1852): Blur(p=.01), MedianBlur(p=.01),
  ToGray(p=.01), CLAHE(p=.01), ImageCompression(quality 75-100, p=.5);
  applied per image on CPU via cv2 between MixUp and RandomHSV
  (v8_transforms compose order, augment.py:2278-2343).
- `bgr` hyp (cfg/default.yaml; Format._format_img augment.py:2105): the
  reference pipeline carries cv2 BGR images and flips channels at Format time
  with probability (1 - bgr), i.e. `bgr` is the probability the network sees
  the swapped order. Our pipeline is RGB throughout, so the equivalent is a
  probability-`bgr` RGB<->BGR swap.

All ops are branchless (computed for every image, selected by per-image
probability draws) so the whole stage stays inside the augment program's one
jit. Analog notes vs cv2: blur/median use replicate edge padding
(cv2 reflect-101 differs on a 1-2px fringe); MedianBlur is fixed at k=3;
CLAHE equalizes luma and rescales RGB by the luma ratio (cv2 works on LAB-L);
ImageCompression reproduces JPEG's luma-path DCT quantization without chroma
subsampling. Each is an intended-behavior analog, not a bit-exact port.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

P_BLUR = 0.01
P_MEDIAN = 0.01
P_GRAY = 0.01
P_CLAHE = 0.01
P_JPEG = 0.5

_LUMA = (0.299, 0.587, 0.114)

# standard JPEG quantization tables (Annex K of ITU-T T.81 — public spec)
_QY = (
    (16, 11, 10, 16, 24, 40, 51, 61),
    (12, 12, 14, 19, 26, 58, 60, 55),
    (14, 13, 16, 24, 40, 57, 69, 56),
    (14, 17, 22, 29, 51, 87, 80, 62),
    (18, 22, 37, 56, 68, 109, 103, 77),
    (24, 35, 55, 64, 81, 104, 113, 92),
    (49, 64, 78, 87, 103, 121, 120, 101),
    (72, 92, 95, 98, 112, 100, 103, 99),
)
_QC = (
    (17, 18, 24, 47, 99, 99, 99, 99),
    (18, 21, 26, 66, 99, 99, 99, 99),
    (24, 26, 56, 99, 99, 99, 99, 99),
    (47, 66, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99),
    (99, 99, 99, 99, 99, 99, 99, 99),
)


def _window_mean_1d(x, k: int, axis: int):
    """Length-k moving mean along `axis` with replicate edge padding."""
    p = k // 2
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    reps_f = jnp.concatenate([first] * p, axis=axis)
    reps_l = jnp.concatenate([last] * p, axis=axis)
    xp = jnp.concatenate([reps_f, x, reps_l], axis=axis)
    c = jnp.cumsum(xp, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)
    hi = jax.lax.slice_in_dim(c, k, k + x.shape[axis], axis=axis)
    lo = jax.lax.slice_in_dim(c, 0, x.shape[axis], axis=axis)
    return (hi - lo) / k


def box_blur(im, k: int):
    """k x k box blur of (S,S,C), separable (cv2.blur analog)."""
    return _window_mean_1d(_window_mean_1d(im, k, 0), k, 1)


def median3(im):
    """3x3 median filter of (S,S,C) with replicate edges (cv2.medianBlur k=3)."""
    p = jnp.pad(im, ((1, 1), (1, 1), (0, 0)), mode="edge")
    S = im.shape[0]
    taps = jnp.stack([p[dy:dy + S, dx:dx + S] for dy in range(3) for dx in range(3)])
    return jnp.median(taps, axis=0)


def to_gray(im):
    """Replicated-luma grayscale (albumentations ToGray / cv2 BGR2GRAY weights)."""
    l = im @ jnp.asarray(_LUMA, im.dtype)
    return jnp.repeat(l[..., None], 3, axis=-1)


def clahe(im, clip_limit, grid: int = 8, bins: int = 256):
    """Clip-limited adaptive histogram equalization of (S,S,3) in [0,1].

    cv2.createCLAHE semantics on the luma channel: per-tile clipped histogram
    -> redistributed CDF -> per-tile LUT, bilinearly interpolated between the
    4 neighboring tile mappings at each pixel. RGB is rescaled by the
    luma ratio (the reference equalizes LAB-L; same intent).
    Requires S % grid == 0 (the augment canvas is stride-64 aligned).
    """
    S = im.shape[0]
    ts = S // grid
    luma = im @ jnp.asarray(_LUMA, im.dtype)
    q = jnp.clip(jnp.round(luma * (bins - 1)), 0, bins - 1).astype(jnp.int32)

    tile_id = (jnp.arange(S)[:, None] // ts) * grid + jnp.arange(S)[None, :] // ts
    hist = jnp.zeros((grid * grid, bins), jnp.float32).at[
        tile_id.ravel(), q.ravel()].add(1.0).reshape(grid, grid, bins)
    limit = jnp.maximum(clip_limit * ts * ts / bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins
    cdf = jnp.cumsum(hist, axis=-1)
    # cv2: lut = round((cdf - cdf_min) scaled); the standard simple form maps
    # cdf/(tile pixels) onto [0, bins-1]
    lut = cdf / (ts * ts) * (bins - 1)  # (grid, grid, bins)

    yy = (jnp.arange(S, dtype=jnp.float32) + 0.5) / ts - 0.5
    t0 = jnp.clip(jnp.floor(yy), 0, grid - 1).astype(jnp.int32)
    t1 = jnp.clip(t0 + 1, 0, grid - 1)
    # fractional distance between tile centers; at the borders t0 == t1 so
    # the (then-arbitrary) weight cancels
    f = yy - jnp.floor(yy)

    def at(ty, tx):
        return lut[ty[:, None], tx[None, :], q]

    v = (at(t0, t0) * (1 - f)[:, None] * (1 - f)[None, :]
         + at(t0, t1) * (1 - f)[:, None] * f[None, :]
         + at(t1, t0) * f[:, None] * (1 - f)[None, :]
         + at(t1, t1) * f[:, None] * f[None, :])
    new_luma = v / (bins - 1)
    ratio = (new_luma + 1e-6) / (luma + 1e-6)
    return jnp.clip(im * ratio[..., None], 0.0, 1.0)


def _dct_matrix(n: int = 8):
    k = jnp.arange(n, dtype=jnp.float32)
    d = jnp.cos((2 * k[None, :] + 1) * k[:, None] * math.pi / (2 * n))
    return d * jnp.where(k[:, None] == 0, 1.0 / math.sqrt(n), math.sqrt(2.0 / n))


def jpeg_compress(im, quality):
    """JPEG-artifact augmentation of (S,S,3) in [0,1] (S % 8 == 0).

    Albumentations ImageCompression analog: RGB -> full-range YCbCr, 8x8
    block DCT (two 8x8 matmuls — MXU-shaped), quantize/dequantize with the
    T.81 tables scaled by `quality` (traced scalar), inverse DCT, back to
    RGB. No 4:2:0 chroma subsampling (the dominant artifact is quantization).
    """
    S = im.shape[0]
    n = S // 8
    r, g, b = im[..., 0] * 255, im[..., 1] * 255, im[..., 2] * 255
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    ycc = jnp.stack([y, cb, cr], axis=0)  # (3,S,S), centered

    scale = jnp.where(quality < 50, 5000.0 / jnp.maximum(quality, 1), 200.0 - 2.0 * quality)
    qy = jnp.clip(jnp.floor((jnp.asarray(_QY, jnp.float32) * scale + 50) / 100), 1, 255)
    qc = jnp.clip(jnp.floor((jnp.asarray(_QC, jnp.float32) * scale + 50) / 100), 1, 255)
    tbl = jnp.stack([qy, qc, qc])  # (3,8,8)

    blocks = ycc.reshape(3, n, 8, n, 8).transpose(0, 1, 3, 2, 4)  # (3,n,n,8,8)
    D = _dct_matrix()
    coef = jnp.einsum("ij,cnmjk,lk->cnmil", D, blocks, D)
    deq = jnp.round(coef / tbl[:, None, None]) * tbl[:, None, None]
    rec = jnp.einsum("ji,cnmjk,kl->cnmil", D, deq, D)
    ycc2 = rec.transpose(0, 1, 3, 2, 4).reshape(3, S, S)
    y2, cb2, cr2 = ycc2[0] + 128.0, ycc2[1], ycc2[2]
    r2 = y2 + 1.402 * cr2
    g2 = y2 - 0.344136 * cb2 - 0.714136 * cr2
    b2 = y2 + 1.772 * cb2
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1) / 255.0, 0.0, 1.0)


def photometric_one(im, key):
    """Apply the Albumentations-analog stack to one (S,S,3) [0,1] image."""
    kp, kb, kc, kq = jax.random.split(key, 4)
    p = jax.random.uniform(kp, (5,))

    bk = jax.random.randint(kb, (), 0, 3)  # blur kernel in {3,5,7}
    blurred = jnp.select([bk == 0, bk == 1], [box_blur(im, 3), box_blur(im, 5)],
                         box_blur(im, 7))
    im = jnp.where(p[0] < P_BLUR, blurred, im)
    im = jnp.where(p[1] < P_MEDIAN, median3(im), im)
    im = jnp.where(p[2] < P_GRAY, to_gray(im), im)
    cl = jax.random.uniform(kc, (), minval=1.0, maxval=4.0)  # alb clip_limit (1,4)
    im = jnp.where(p[3] < P_CLAHE, clahe(im, cl), im)
    if im.shape[0] % 8 == 0:
        q = jax.random.uniform(kq, (), minval=75.0, maxval=100.0)
        im = jnp.where(p[4] < P_JPEG, jpeg_compress(im, q), im)
    return im


def photometric_batch(img01, key, hyp: dict, chunk: int = 8):
    """Albumentations-analog stage; static-gated by hyp['photometric'].

    Memory diet: mapped over the batch in `chunk`-image slices (lax.map
    batch_size) rather than one full-batch vmap. The branchless stack
    materializes every candidate (the 9-tap median stack alone is
    9*B*S*S*3 floats — ~5.7 GB at B=128/640px, which OOMed a train step
    already at 15.4/16 GB HBM); chunking bounds the stage's live temporaries
    to the slice while computing the identical result. The stage is a tiny
    fraction of step FLOPs, so serializing it costs little (measured:
    PERF.md §photometric).
    """
    if not float(hyp.get("photometric", 1.0)):
        return img01
    B = img01.shape[0]
    keys = jax.random.split(key, B)
    if B <= chunk:
        return jax.vmap(photometric_one)(img01, keys)
    return jax.lax.map(lambda xk: photometric_one(*xk), (img01, keys),
                       batch_size=chunk)


def bgr_swap_batch(img01, key, hyp: dict):
    """Probability-`bgr` RGB<->BGR channel swap (reference Format stage,
    augment.py:2105 — there phrased as NOT converting its BGR buffers)."""
    pbgr = float(hyp.get("bgr", 0.0))
    if pbgr <= 0:
        return img01
    do = jax.random.uniform(key, (img01.shape[0],)) < pbgr
    return jnp.where(do[:, None, None, None], img01[..., ::-1], img01)
