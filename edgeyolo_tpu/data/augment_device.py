"""Fused on-device training augmentation: mosaic4 + random affine + HSV +
flip + mixup as ONE jittable program over a uint8 NHWC batch.

Behavioral spec (reference, ultralytics/data/augment.py): Mosaic4:560,
RandomPerspective homography M = T.S.R.Sh.C with gray-114 border:952-1113,
RandomHSV:1367, RandomFlip:1383, MixUp:867. The reference runs this per-image
on CPU with cv2.warpAffine; here the mosaic placement and the affine warp are
FUSED into a single inverse-map bilinear gather per output pixel, batched over
B on the TPU — the host only decodes JPEGs (SURVEY.md §7 'north star').

Boxes ride the forward transform (4-corner projection + min/max + candidate
filter), all fixed-shape: each output image carries 4*max_gt padded slots.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

GRAY = 114.0


def _affine_params(key, S: int, hyp: dict):
    """Random forward canvas->output homography (3,3), reference semantics."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    deg = float(hyp.get("degrees", 0.0))
    tra = float(hyp.get("translate", 0.1))
    scl = float(hyp.get("scale", 0.5))
    shr = float(hyp.get("shear", 0.0))
    per = float(hyp.get("perspective", 0.0))

    a = jax.random.uniform(k1, (), minval=-deg, maxval=deg) * math.pi / 180.0
    s = jax.random.uniform(k2, (), minval=1.0 - scl, maxval=1.0 + scl)
    shx = jnp.tan(jax.random.uniform(k3, (), minval=-shr, maxval=shr) * math.pi / 180.0)
    shy = jnp.tan(jax.random.uniform(k4, (), minval=-shr, maxval=shr) * math.pi / 180.0)
    t = jax.random.uniform(k5, (2,), minval=0.5 - tra, maxval=0.5 + tra) * S

    cos, sin = jnp.cos(a) * s, jnp.sin(a) * s
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(cos).at[0, 1].set(-sin).at[1, 0].set(sin).at[1, 1].set(cos)
    Sh = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Sh = Sh.at[0, 1].set(shx).at[1, 0].set(shy)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 2].set(t[0]).at[1, 2].set(t[1])
    # perspective terms (usually 0.0)
    P = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    del per  # perspective == 0 in every reference config; kept for parity surface
    return T @ Sh @ R @ P


def _bilinear_gather(quads: jnp.ndarray, img_idx, yy, xx):
    """Sample quads (4,S,S,3) at per-pixel (img_idx, yy, xx); OOB -> gray."""
    S = quads.shape[1]
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0)[..., None]
    fx = (xx - x0)[..., None]

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < S) & (xi >= 0) & (xi < S)
        v = quads[img_idx, jnp.clip(yi, 0, S - 1), jnp.clip(xi, 0, S - 1)]
        return jnp.where(valid[..., None], v, GRAY)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx + v10 * fy * (1 - fx) + v11 * fy * fx)


def _warp_one(quads, boxes4, valid4, kpts4, key, S: int, hyp: dict, mosaic: bool):
    """One output image from its 4 source quads.

    quads: (4,S,S,3) float; boxes4: (4,M,4) normalized xywh; valid4: (4,M).
    Returns (img (S,S,3), boxes (4M,4) normalized xywh, valid (4M,)).
    """
    M4 = boxes4.shape[0] * boxes4.shape[1]
    kc, ka = jax.random.split(key)
    # mosaic center in canvas coords (canvas is 2S x 2S; center ~ U[0.5S, 1.5S])
    c = jax.random.uniform(kc, (2,), minval=0.5 * S, maxval=1.5 * S)  # (yc, xc)
    yc, xc = (c[0], c[1]) if mosaic else (jnp.asarray(float(S)), jnp.asarray(float(S)))

    A = _affine_params(ka, S, hyp)  # centered-canvas -> output homography
    # C centers the canvas at the origin (translate by -canvas_size/2); T inside
    # A re-centers at ~(0.5 +- translate)*S. Net map: p_out = A @ (p_canvas - offs),
    # identity at zero magnitudes. Canvas is 2S for mosaic, S for single image.
    offs = float(S) if mosaic else 0.5 * S
    Ainv = jnp.linalg.inv(A)

    ys = jnp.arange(S, dtype=jnp.float32)
    xs = jnp.arange(S, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1)  # (S,S,3)
    src = pts @ Ainv.T  # (S,S,3) canvas-centered coords
    u = src[..., 1] / src[..., 2] + offs  # canvas y
    v = src[..., 0] / src[..., 2] + offs  # canvas x

    if mosaic:
        right = (v >= xc).astype(jnp.int32)
        bottom = (u >= yc).astype(jnp.int32)
        img_idx = right + 2 * bottom  # 0 tl, 1 tr, 2 bl, 3 br
        y_loc = u - jnp.where(bottom == 1, yc, yc - S)
        x_loc = v - jnp.where(right == 1, xc, xc - S)
    else:
        img_idx = jnp.zeros_like(u, dtype=jnp.int32)
        y_loc, x_loc = u, v

    img = _bilinear_gather(quads, img_idx, y_loc, x_loc)

    # ---- labels: forward transform ------------------------------------------
    if mosaic:
        oy = jnp.stack([yc - S, yc - S, yc, yc])  # per-quadrant origin
        ox = jnp.stack([xc - S, xc, xc - S, xc])
    else:
        oy = jnp.zeros((4,))
        ox = jnp.zeros((4,))
    b = boxes4 * S  # pixel xywh within each source image
    x1 = b[..., 0] - b[..., 2] / 2 + ox[:, None]
    y1 = b[..., 1] - b[..., 3] / 2 + oy[:, None]
    x2 = b[..., 0] + b[..., 2] / 2 + ox[:, None]
    y2 = b[..., 1] + b[..., 3] / 2 + oy[:, None]
    # 4 corners through the affine (canvas -> output)
    cx = jnp.stack([x1, x2, x1, x2], -1) - offs  # (4,M,4corners)
    cy = jnp.stack([y1, y1, y2, y2], -1) - offs
    ph = jnp.stack([cx, cy, jnp.ones_like(cx)], -1)  # (4,M,4,3)
    out = ph @ A.T
    px = out[..., 0] / out[..., 2]
    py = out[..., 1] / out[..., 2]
    nx1 = jnp.clip(jnp.min(px, -1), 0, S)
    ny1 = jnp.clip(jnp.min(py, -1), 0, S)
    nx2 = jnp.clip(jnp.max(px, -1), 0, S)
    ny2 = jnp.clip(jnp.max(py, -1), 0, S)
    w_new, h_new = nx2 - nx1, ny2 - ny1
    # candidate filter (reference box_candidates: wh>2px, area ratio>0.1, ar<100)
    w_old = (x2 - x1)
    h_old = (y2 - y1)
    area_ratio = (w_new * h_new) / (w_old * h_old + 1e-16)
    ar = jnp.maximum(w_new / (h_new + 1e-16), h_new / (w_new + 1e-16))
    keep = (w_new > 2) & (h_new > 2) & (area_ratio > 0.10) & (ar < 100)
    valid = valid4 & keep  # (4,M)
    boxes_out = jnp.stack(
        [(nx1 + nx2) / 2 / S, (ny1 + ny2) / 2 / S, w_new / S, h_new / S], axis=-1
    ).reshape(M4, 4)
    kpts_out = None
    if kpts4 is not None:
        kpts_out = _warp_kpts(kpts4, oy, ox, A, offs, S, valid)
    return img, boxes_out, valid.reshape(M4), kpts_out


def _rgb_to_hsv(rgb):
    """Vectorized RGB->HSV on [0,1] floats, channels-last."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, ((g - b) / d) % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = d / (mx + 1e-12)
    return jnp.stack([h % 1.0, s, mx], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hsv_aug(img01, key, hyp):
    """Random HSV jitter on [0,1] RGB (reference RandomHSV semantics)."""
    gains = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    gains = gains * jnp.asarray([
        float(hyp.get("hsv_h", 0.015)), float(hyp.get("hsv_s", 0.7)), float(hyp.get("hsv_v", 0.4))
    ]) + 1.0
    hsv = _rgb_to_hsv(img01)
    h = (hsv[..., 0] * gains[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * gains[1], 0, 1)
    v = jnp.clip(hsv[..., 2] * gains[2], 0, 1)
    return jnp.clip(_hsv_to_rgb(jnp.stack([h, s, v], -1)), 0, 1)


def _warp_kpts(kpts4, oy, ox, A, offs, S, valid):
    """Forward-transform keypoints through the mosaic+affine map.

    kpts4: (4, M, K, 3) letterbox-pixel coords + vis. Returns (4*M, K, 3)
    with out-of-canvas keypoints marked invisible.
    """
    four, M, K, _ = kpts4.shape
    px = kpts4[..., 0] + ox[:, None, None] - offs
    py = kpts4[..., 1] + oy[:, None, None] - offs
    ph = jnp.stack([px, py, jnp.ones_like(px)], -1)  # (4,M,K,3)
    out = ph @ A.T
    x = out[..., 0] / out[..., 2]
    y = out[..., 1] / out[..., 2]
    inb = (x >= 0) & (x < S) & (y >= 0) & (y < S)
    vis = kpts4[..., 2] * inb.astype(kpts4.dtype) * valid[..., None].astype(kpts4.dtype)
    return jnp.stack([x, y, vis], -1).reshape(four * M, K, 3)


@partial(jax.jit, static_argnames=("imgsz", "mosaic", "hyp_key"))
def _augment_impl(images, cls, bboxes, mask, key, imgsz, mosaic, hyp_key, keypoints=None):
    hyp = dict(hyp_key)
    hyp_extra = {"keypoints": keypoints}
    B, S = images.shape[0], imgsz
    M = cls.shape[1]
    imgs_f = images.astype(jnp.float32)

    keys = jax.random.split(key, B * 4).reshape(B, 4, 2)

    # partner indices for mosaic (3 random others per image)
    kpart = jax.random.fold_in(key, 17)
    part = jax.random.randint(kpart, (B, 3), 1, B) if B > 1 else jnp.ones((B, 3), jnp.int32)
    base = jnp.arange(B)[:, None]
    sel = jnp.concatenate([base, (base + part) % B], axis=1)  # (B,4)

    quads = imgs_f[sel]  # (B,4,S,S,3)
    boxes4 = bboxes[sel]  # (B,4,M,4)
    cls4 = cls[sel].reshape(B, 4 * M)
    valid4 = mask[sel] > 0  # (B,4,M)

    kpts = hyp_extra.get("keypoints")
    if kpts is not None:
        kpts4 = kpts[sel]  # (B,4,M,K,3)
        warp = jax.vmap(lambda q, b, v, kk, k: _warp_one(q, b, v, kk, k, S, hyp, mosaic))
        img, boxes_out, valid, kpts_out = warp(quads, boxes4, valid4, kpts4, keys[:, 0])
    else:
        warp = jax.vmap(lambda q, b, v, k: _warp_one(q, b, v, None, k, S, hyp, mosaic))
        img, boxes_out, valid, _ = warp(quads, boxes4, valid4, keys[:, 0])
        kpts_out = None

    img01 = img / 255.0
    img01 = jax.vmap(lambda im, k: _hsv_aug(im, k, hyp))(img01, keys[:, 1])

    # horizontal flip (disabled when keypoints ride along: left/right kpt
    # semantics need a flip_idx remap, applied upstream when provided)
    pflip = 0.0 if kpts_out is not None else float(hyp.get("fliplr", 0.5))
    do_flip = jax.random.uniform(jax.random.fold_in(key, 29), (B,)) < pflip
    img01 = jnp.where(do_flip[:, None, None, None], img01[:, :, ::-1, :], img01)
    bx = jnp.where(do_flip[:, None], 1.0 - boxes_out[..., 0], boxes_out[..., 0])
    boxes_out = boxes_out.at[..., 0].set(bx)
    # vertical flip
    pflipud = 0.0 if kpts_out is not None else float(hyp.get("flipud", 0.0))
    if pflipud > 0:
        do_f = jax.random.uniform(jax.random.fold_in(key, 31), (B,)) < pflipud
        img01 = jnp.where(do_f[:, None, None, None], img01[:, ::-1, :, :], img01)
        by = jnp.where(do_f[:, None], 1.0 - boxes_out[..., 1], boxes_out[..., 1])
        boxes_out = boxes_out.at[..., 1].set(by)

    # mixup (static gate on hyp)
    pmix = float(hyp.get("mixup", 0.0))
    if pmix > 0 and kpts_out is None:
        kmix = jax.random.fold_in(key, 37)
        do_mix = jax.random.uniform(kmix, (B,)) < pmix
        lam = jax.random.beta(jax.random.fold_in(key, 41), 32.0, 32.0, (B,))
        other = jnp.roll(jnp.arange(B), -1)
        mixed = lam[:, None, None, None] * img01 + (1 - lam)[:, None, None, None] * img01[other]
        img01 = jnp.where(do_mix[:, None, None, None], mixed, img01)
        boxes_out = jnp.concatenate([boxes_out, boxes_out[other]], axis=1)
        cls4 = jnp.concatenate([cls4, cls4[other]], axis=1)
        valid = jnp.concatenate([valid, valid[other] & do_mix[:, None]], axis=1)

    boxes_out = boxes_out * valid[..., None]
    if kpts_out is not None:
        return img01, cls4, boxes_out, valid.astype(jnp.float32), kpts_out
    return img01, cls4, boxes_out, valid.astype(jnp.float32)


def augment_batch(images, cls, bboxes, mask, key, imgsz: int, hyp: dict, mosaic: bool = True,
                  keypoints=None):
    """Apply the fused augmentation program.

    images (B,S,S,3) uint8; cls (B,M); bboxes (B,M,4) normalized xywh;
    mask (B,M); keypoints optional (B,M,K,3) letterbox pixels (pose task —
    flips should be disabled unless a flip_idx remap is applied upstream).
    Returns (images01 f32, cls (B,4M[*2]), bboxes, mask[, keypoints]).
    """
    hyp_key = tuple(sorted((k, float(v)) for k, v in hyp.items() if isinstance(v, (int, float))))
    return _augment_impl(images, cls, bboxes, mask, key, imgsz, mosaic, hyp_key, keypoints)
