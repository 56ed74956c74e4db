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
    """3x3 median filter of (S,S,C) with replicate edges (cv2.medianBlur k=3).

    Median-of-9 via the Smith exchange network (19 min/max pairs) — pure VPU
    elementwise ops, no sort; jnp.median's general sort was ~3x slower on
    TPU (PERF.md §photometric)."""
    p = jnp.pad(im, ((1, 1), (1, 1), (0, 0)), mode="edge")
    S = im.shape[0]
    t = [p[dy:dy + S, dx:dx + S] for dy in range(3) for dx in range(3)]

    def cx(i, j):
        lo, hi = jnp.minimum(t[i], t[j]), jnp.maximum(t[i], t[j])
        t[i], t[j] = lo, hi

    # J. L. Smith's 19-exchange median-of-9 network
    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        cx(i, j)
    return t[4]


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

    # per-tile histogram as a compare-and-reduce (TPU: a scatter-add here was
    # 22x slower — 28 ms vs 1.3 ms for 8 images at 640px, PERF.md
    # §photometric)
    qt = q.reshape(grid, ts, grid, ts).transpose(0, 2, 1, 3).reshape(
        grid, grid, ts * ts)
    hist = jnp.sum((qt[..., None] == jnp.arange(bins, dtype=jnp.int32)
                    ).astype(jnp.float32), axis=2)  # (grid, grid, bins)
    limit = jnp.maximum(clip_limit * ts * ts / bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins
    cdf = jnp.cumsum(hist, axis=-1)
    # cv2: lut = round((cdf - cdf_min) scaled); the standard simple form maps
    # cdf/(tile pixels) onto [0, bins-1]; normalized to [0,1] here so the
    # onehot reduce below accumulates small numbers
    lut = cdf / (ts * ts)  # (grid, grid, bins) in [0,1]

    # LUT application WITHOUT a per-pixel gather (a (S,S) gather from the
    # (grid,grid,bins) table was 129 ms for 8 images — the whole CLAHE cost;
    # interpolating the LUTs to a per-pixel (S,S,bins) tensor materialized
    # 4x420 MB instead): pad by a half tile so every pixel falls in one of
    # (grid+1)^2 aligned blocks whose FOUR neighbor-tile LUTs are constant,
    # then one batched onehot(q) @ LUT4 einsum per block — MXU/VPU work with
    # only a (G^2,bins,4) table (measured 4.6 ms for 8 images). This is also
    # cv2's border semantics (edge tiles replicate); the per-pixel
    # formulation it replaces interpolated INTO tile 1 at the top/left
    # border.
    h2 = ts // 2
    G = grid + 1
    qp = jnp.pad(q, ((h2, h2), (h2, h2)), mode="edge")
    qb = qp.reshape(G, ts, G, ts).transpose(0, 2, 1, 3).reshape(G * G, ts * ts)
    oh = jax.nn.one_hot(qb, bins, dtype=jnp.bfloat16)
    c0 = jnp.clip(jnp.arange(G) - 1, 0, grid - 1)
    c1 = jnp.clip(jnp.arange(G), 0, grid - 1)
    Lb = lut.astype(jnp.bfloat16)
    L4 = jnp.stack([Lb[c0[:, None], c0[None, :]], Lb[c0[:, None], c1[None, :]],
                    Lb[c1[:, None], c0[None, :]], Lb[c1[:, None], c1[None, :]]],
                   axis=-1).reshape(G * G, bins, 4)
    vb = jnp.einsum("bpc,bcd->bpd", oh, L4,
                    preferred_element_type=jnp.float32)  # (G^2, ts^2, 4)
    fy = (jnp.arange(ts, dtype=jnp.float32) + 0.5) / ts
    vb = vb.reshape(G, G, ts, ts, 2, 2)
    v = (vb[..., 0, 0] * (1 - fy)[:, None] * (1 - fy)[None, :]
         + vb[..., 0, 1] * (1 - fy)[:, None] * fy[None, :]
         + vb[..., 1, 0] * fy[:, None] * (1 - fy)[None, :]
         + vb[..., 1, 1] * fy[:, None] * fy[None, :])
    v = v.transpose(0, 2, 1, 3).reshape(S + ts, S + ts)[h2:-h2, h2:-h2]
    new_luma = v
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

    # per-8-block 2-D DCT as two BLOCK-DIAGONAL (S,S) matmuls — kron(I, D) —
    # instead of batched 8x8 einsums over a (3,n,n,8,8) relayout: the tiny
    # matmuls underfill the MXU and the two transposes are pure HBM traffic.
    # The zero blocks waste FLOPs (S/8x more) but DCT compute is negligible
    # and the matmul is MXU-shaped; f32 keeps the quantize/round exact.
    D = _dct_matrix()
    BD = jnp.kron(jnp.eye(n, dtype=jnp.float32), D)  # (S, S)
    coef = jnp.einsum("ij,cjk,lk->cil", BD, ycc, BD,
                      preferred_element_type=jnp.float32)
    tbl_full = jnp.tile(tbl, (1, n, n))  # (3,S,S): the 8x8 table per block
    deq = jnp.round(coef / tbl_full) * tbl_full
    ycc2 = jnp.einsum("ji,cjk,kl->cil", BD, deq, BD,
                      preferred_element_type=jnp.float32)
    y2, cb2, cr2 = ycc2[0] + 128.0, ycc2[1], ycc2[2]
    r2 = y2 + 1.402 * cr2
    g2 = y2 - 0.344136 * cb2 - 0.714136 * cr2
    b2 = y2 + 1.772 * cb2
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1) / 255.0, 0.0, 1.0)


def _rare_one(im, key, pscale: float = 1.0):
    """The p=0.01 ops (blur / median / gray / CLAHE) on one image, each
    probability scaled by `pscale` (used by the subset formulation below)."""
    kp, kb, kc = jax.random.split(key, 3)
    p = jax.random.uniform(kp, (4,))
    bk = jax.random.randint(kb, (), 0, 3)  # blur kernel in {3,5,7}
    blurred = jnp.select([bk == 0, bk == 1], [box_blur(im, 3), box_blur(im, 5)],
                         box_blur(im, 7))
    im = jnp.where(p[0] < P_BLUR * pscale, blurred, im)
    im = jnp.where(p[1] < P_MEDIAN * pscale, median3(im), im)
    im = jnp.where(p[2] < P_GRAY * pscale, to_gray(im), im)
    cl = jax.random.uniform(kc, (), minval=1.0, maxval=4.0)  # alb clip_limit (1,4)
    im = jnp.where(p[3] < P_CLAHE * pscale, clahe(im, cl), im)
    return im


def photometric_one(im, key):
    """Apply the Albumentations-analog stack to one (S,S,3) [0,1] image."""
    kr, kp, kq = jax.random.split(key, 3)
    im = _rare_one(im, kr)
    if im.shape[0] % 8 == 0:
        q = jax.random.uniform(kq, (), minval=75.0, maxval=100.0)
        im = jnp.where(jax.random.uniform(kp) < P_JPEG, jpeg_compress(im, q), im)
    return im


def photometric_batch(img01, key, hyp: dict, k_rare: int = 8, jpeg_chunk: int = 32):
    """Albumentations-analog stage; static-gated by hyp['photometric'].

    Subset formulation (round 5): the original branchless stack computed
    every candidate op for every image — at B=128/640px that is 9-tap median
    stacks (~5.7 GB live, which OOMed the 15.4/16 GB train step) and 128
    CLAHE scatter-add histograms for ops that fire with p=0.01; the chunked
    lax.map that bounded the memory then serialized the batch 16x (measured:
    full train step 519 -> 34 img/s, PERF.md §photometric). Instead:

    - rare ops (blur/median/gray/CLAHE, p=0.01 each): gather `k_rare`
      randomly-chosen images, run the stack only there with probabilities
      scaled by B/k_rare — the marginal per-image probability is exactly p —
      and scatter back. Truncation bias: at most k_rare images per batch can
      receive rare ops (P(Poisson(4*0.01*128) > 8) ~ 7%) and the ops
      correlate onto the same subset; immaterial for an augmentation analog,
      while the heavy compute drops from B images to k_rare.
    - JPEG (p=0.5): exactly round(B*p) images via an independent permutation
      (same mean as per-image Bernoulli, slightly lower variance), computed
      in `jpeg_chunk` slices — the DCT einsums are MXU-cheap; chunking only
      bounds the (3,S/8,S/8,8,8) block temporaries.
    """
    if not float(hyp.get("photometric", 1.0)):
        return img01
    B = img01.shape[0]
    if B <= k_rare:
        return jax.vmap(photometric_one)(img01, jax.random.split(key, B))
    k2, k4 = jax.random.split(key)

    # STATIC strided subset positions, not a random permutation: this stage
    # runs INSIDE the pjit'd train step on a batch-sharded tensor, and a
    # traced gather over the batch axis would all-gather the whole image
    # batch over ICI. A reshape + leading-slice is shard-local and spreads
    # the k_rare images evenly across devices; which IMAGE sits at a
    # selected position is already random (dataloader shuffle), and the
    # per-image Bernoulli gates in _rare_one re-randomize per step.
    stride = B // k_rare
    ns = k_rare * stride
    g = img01[:ns].reshape(k_rare, stride, *img01.shape[1:])
    sub = g[:, 0]
    rkeys = jax.random.split(k2, k_rare)
    sub = jax.vmap(lambda im, kk: _rare_one(im, kk, pscale=B / k_rare))(sub, rkeys)
    g = g.at[:, 0].set(sub)
    img01 = jnp.concatenate([g.reshape(ns, *img01.shape[1:]), img01[ns:]], 0) \
        if ns < B else g.reshape(B, *img01.shape[1:])

    if img01.shape[1] % 8 == 0 and img01.shape[1] == img01.shape[2]:
        # JPEG p=0.5 == every even position (same static-position argument;
        # the 75-100 quality draw is random per image per step)
        nj = B // 2
        g = img01[:nj * 2].reshape(nj, 2, *img01.shape[1:])
        jq = jax.random.uniform(k4, (nj,), minval=75.0, maxval=100.0)
        js = jax.lax.map(lambda xq: jpeg_compress(*xq), (g[:, 0], jq),
                         batch_size=min(jpeg_chunk, nj))
        g = g.at[:, 0].set(js)
        img01 = jnp.concatenate([g.reshape(nj * 2, *img01.shape[1:]),
                                 img01[nj * 2:]], 0) \
            if nj * 2 < B else g.reshape(B, *img01.shape[1:])
    return img01


def bgr_swap_batch(img01, key, hyp: dict):
    """Probability-`bgr` RGB<->BGR channel swap (reference Format stage,
    augment.py:2105 — there phrased as NOT converting its BGR buffers)."""
    pbgr = float(hyp.get("bgr", 0.0))
    if pbgr <= 0:
        return img01
    do = jax.random.uniform(key, (img01.shape[0],)) < pbgr
    return jnp.where(do[:, None, None, None], img01[..., ::-1], img01)
