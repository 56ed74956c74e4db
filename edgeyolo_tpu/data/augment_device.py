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
    """Random forward canvas->output homography (3,3), reference semantics
    (augment.py:952 RandomPerspective: M = T @ Sh @ R @ P, center via offs).
    """
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    deg = float(hyp.get("degrees", 0.0))
    tra = float(hyp.get("translate", 0.1))
    scl = float(hyp.get("scale", 0.5))
    shr = float(hyp.get("shear", 0.0))
    per = float(hyp.get("perspective", 0.0))

    a = jax.random.uniform(k1, (), minval=-deg, maxval=deg) * math.pi / 180.0
    s = jax.random.uniform(k2, (), minval=1.0 - scl, maxval=1.0 + scl)
    if float(hyp.get("multi_scale", 0.0)):
        # TPU-native multi_scale: the reference resizes the canvas to a random
        # imgsz in [0.5, 1.5]x each batch (detect/train.py:57-74), which is a
        # dynamic shape. On a static canvas the equivalent pixel-scale jitter
        # is an extra content-scale factor folded into the homography.
        s = s * jax.random.uniform(k6, (), minval=0.5, maxval=1.5)
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
    # projective terms (reference samples both in [-perspective, perspective];
    # the warp and all label paths already divide by the homogeneous coord)
    P = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    if per > 0:
        pv = jax.random.uniform(k7, (2,), minval=-per, maxval=per)
        P = P.at[2, 0].set(pv[0]).at[2, 1].set(pv[1])
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


def _axis_weights(loc, S: int, n_groups: int, group_of):
    """Per-axis bilinear interpolation weights for the separable warp.

    loc: (S,) float source coordinate (tile-local) for each output position.
    group_of: (S,) int tile-group index per output position.
    Returns (G, S, S): weight of tile coordinate u at output position i,
    zeroed outside the position's group and for out-of-tile taps (the gray
    border emerges from the weight deficit).
    """
    i0 = jnp.floor(loc).astype(jnp.int32)
    f = loc - i0
    ok0 = ((i0 >= 0) & (i0 < S)).astype(loc.dtype)
    ok1 = ((i0 + 1 >= 0) & (i0 + 1 < S)).astype(loc.dtype)
    w = (jax.nn.one_hot(jnp.clip(i0, 0, S - 1), S) * ((1 - f) * ok0)[:, None]
         + jax.nn.one_hot(jnp.clip(i0 + 1, 0, S - 1), S) * (f * ok1)[:, None])
    gmask = jax.nn.one_hot(group_of, n_groups, dtype=loc.dtype)  # (S, G)
    return jnp.einsum("iu,ig->giu", w, gmask)


def _separable_accumulate(quads, y_loc, gy, ngy, x_loc, gx, ngx, tile_of, S):
    """Mosaic + axis-aligned affine as per-axis matmuls (MXU path).

    Valid when degrees == shear == perspective == 0 (the reference's default
    detect hyps): the inverse map factorizes into a row coordinate u(i) and a
    column coordinate v(j), so bilinear sampling is out = Wy @ tile @ Wx^T
    summed over the mosaic tiles — two (S,S)x(S,S*3) matmuls per tile instead
    of a 4-tap 2D gather (which costs ~1.1 s/batch at b32/640 on v5e; the
    matmul form runs at MXU speed).
    """
    Wy = _axis_weights(y_loc, S, ngy, gy)  # (Gy,S,S)
    Wx = _axis_weights(x_loc, S, ngx, gx)  # (Gx,S,S)
    out = jnp.zeros((S, S, 3), jnp.float32)
    for b in range(ngy):
        for r in range(ngx):
            t = (Wy[b] @ quads[tile_of(b, r)].reshape(S, S * 3)).reshape(S, S, 3)
            out = out + jnp.einsum("ivc,jv->ijc", t, Wx[r])
    wy = Wy.sum(axis=(0, 2))  # (S,) total row weight in [0,1]
    wx = Wx.sum(axis=(0, 2))
    return out + GRAY * (1.0 - wy[:, None] * wx[None, :])[..., None]


def _warp_one(quads, boxes4, valid4, extras, key, S: int, hyp: dict, mosaic: int):
    """One output image from its N source tiles (N=4 mosaic4, N=9 mosaic9,
    or single-image when mosaic is falsy).

    quads: (N,S,S,3) float; boxes4: (N,M,4) normalized xywh; valid4: (N,M);
    extras: dict with optional "keypoints" (N,M,K,3), "masks" (N,M,Sm,Sm)
    binary instance masks, "rboxes" (N,M,5) normalized cx,cy,w,h,angle.
    Returns (img (S,S,3), boxes (NM,4) normalized xywh, valid (NM,), extras_out).

    mosaic9 (reference augment.py:586-680 _mosaic9 + the RandomPerspective
    crop): tiles sit on a regular 3x3 canvas; the output window lands at a
    uniform position over the canvas interior, reproducing the reference's
    random 2S crop + affine window statistics with fixed-size sources.
    """
    n_src = boxes4.shape[0]
    mosaic9 = n_src == 9
    mosaic3 = n_src == 3  # fork's 1x3 layout (reference augment.py:599-650
    # _mosaic3: labeled image center, two partners left/right, gray elsewhere)
    # tile->column order: tile 0 (the labeled image) sits in the middle
    M3_COL_OF_TILE = (1, 2, 0)  # reference places i==1 right, i==2 left
    M3_TILE_OF_COL = (2, 0, 1)
    M4 = boxes4.shape[0] * boxes4.shape[1]
    kc, ka = jax.random.split(key)
    # mosaic4 center in canvas coords (canvas is 2S x 2S; center ~ U[0.5S, 1.5S])
    c = jax.random.uniform(kc, (2,), minval=0.5 * S, maxval=1.5 * S)  # (yc, xc)
    yc, xc = (c[0], c[1]) if mosaic else (jnp.asarray(float(S)), jnp.asarray(float(S)))

    A = _affine_params(ka, S, hyp)  # centered-canvas -> output homography
    # C centers the canvas at the origin (translate by -canvas_size/2); T inside
    # A re-centers at ~(0.5 +- translate)*S. Net map: p_out = A @ (p_canvas - offs),
    # identity at zero magnitudes. Canvas is 2S for mosaic4, 3S for mosaic9,
    # S for a single image. mosaic9 adds a random window offset woff so the
    # output samples anywhere in the canvas interior.
    if mosaic9:
        offs = 1.5 * S
        woff = jax.random.uniform(jax.random.fold_in(kc, 1), (2,),
                                  minval=-0.5 * S, maxval=0.5 * S)  # (y, x)
    elif mosaic3:
        offs = 1.5 * S  # 3S x 3S canvas, tiles occupy the middle row only
        woff = jnp.zeros((2,))
    else:
        offs = float(S) if mosaic else 0.5 * S
        woff = jnp.zeros((2,))
    Ainv = jnp.linalg.inv(A)

    ys = jnp.arange(S, dtype=jnp.float32)
    xs = jnp.arange(S, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1)  # (S,S,3)
    src = pts @ Ainv.T  # (S,S,3) canvas-centered coords
    u = src[..., 1] / src[..., 2] + offs + woff[0]  # canvas y
    v = src[..., 0] / src[..., 2] + offs + woff[1]  # canvas x

    if mosaic9:
        row = jnp.clip(jnp.floor(u / S), 0, 2).astype(jnp.int32)
        col = jnp.clip(jnp.floor(v / S), 0, 2).astype(jnp.int32)
        img_idx = row * 3 + col
        y_loc = u - row.astype(jnp.float32) * S
        x_loc = v - col.astype(jnp.float32) * S
    elif mosaic3:
        col = jnp.clip(jnp.floor(v / S), 0, 2).astype(jnp.int32)
        img_idx = jnp.asarray(M3_TILE_OF_COL, jnp.int32)[col]
        y_loc = u - float(S)  # outside the middle row -> OOB -> gray fill
        x_loc = v - col.astype(jnp.float32) * S
    elif mosaic:
        right = (v >= xc).astype(jnp.int32)
        bottom = (u >= yc).astype(jnp.int32)
        img_idx = right + 2 * bottom  # 0 tl, 1 tr, 2 bl, 3 br
        y_loc = u - jnp.where(bottom == 1, yc, yc - S)
        x_loc = v - jnp.where(right == 1, xc, xc - S)
    else:
        img_idx = jnp.zeros_like(u, dtype=jnp.int32)
        y_loc, x_loc = u, v

    separable = (float(hyp.get("degrees", 0.0)) == 0.0
                 and float(hyp.get("shear", 0.0)) == 0.0
                 and float(hyp.get("perspective", 0.0)) == 0.0
                 and not hyp.get("_force_gather"))  # test hook: A/B the paths
    if separable:
        # the inverse map is axis-aligned: u varies only with the output row,
        # v only with the column — sample via per-axis interp matmuls
        u_ax, v_ax = u[:, 0], v[0, :]
        if mosaic9:
            gy = jnp.clip(jnp.floor(u_ax / S), 0, 2).astype(jnp.int32)
            gx = jnp.clip(jnp.floor(v_ax / S), 0, 2).astype(jnp.int32)
            img = _separable_accumulate(
                quads, u_ax - gy.astype(u_ax.dtype) * S, gy, 3,
                v_ax - gx.astype(v_ax.dtype) * S, gx, 3, lambda b, r: b * 3 + r, S)
        elif mosaic3:
            gx = jnp.clip(jnp.floor(v_ax / S), 0, 2).astype(jnp.int32)
            img = _separable_accumulate(
                quads, u_ax - float(S), jnp.zeros((S,), jnp.int32), 1,
                v_ax - gx.astype(v_ax.dtype) * S, gx, 3,
                lambda b, r: M3_TILE_OF_COL[r], S)
        elif mosaic:
            bot = (u_ax >= yc).astype(jnp.int32)
            rgt = (v_ax >= xc).astype(jnp.int32)
            img = _separable_accumulate(
                quads, u_ax - jnp.where(bot == 1, yc, yc - S), bot, 2,
                v_ax - jnp.where(rgt == 1, xc, xc - S), rgt, 2,
                lambda b, r: 2 * b + r, S)
        else:
            z = jnp.zeros((S,), jnp.int32)
            img = _separable_accumulate(quads, u_ax, z, 1, v_ax, z, 1,
                                        lambda b, r: 0, S)
    else:
        img = _bilinear_gather(quads, img_idx, y_loc, x_loc)

    # ---- labels: forward transform ------------------------------------------
    if not mosaic:
        # only quad 0 contributes pixels; partner-quad labels are phantoms
        valid4 = valid4 & (jnp.arange(n_src)[:, None] == 0)
    if mosaic9:
        rows = jnp.arange(9) // 3
        cols = jnp.arange(9) % 3
        oy = rows.astype(jnp.float32) * S - woff[0]
        ox = cols.astype(jnp.float32) * S - woff[1]
    elif mosaic3:
        oy = jnp.full((3,), float(S))
        ox = jnp.asarray(M3_COL_OF_TILE, jnp.float32) * S
    elif mosaic:
        oy = jnp.stack([yc - S, yc - S, yc, yc])  # per-quadrant origin
        ox = jnp.stack([xc - S, xc, xc - S, xc])
    else:
        oy = jnp.zeros((n_src,))
        ox = jnp.zeros((n_src,))
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
    extras_out = {}
    if "keypoints" in extras:
        extras_out["keypoints"] = _warp_kpts(extras["keypoints"], oy, ox, A, offs, S, valid)
    if "masks" in extras:
        extras_out["masks"] = _warp_masks(extras["masks"], img_idx, y_loc, x_loc, S)
    if "rboxes" in extras:
        rb, rkeep = _warp_rboxes(extras["rboxes"], oy, ox, A, offs, S)
        extras_out["rboxes"] = rb
        # rbox validity uses its own geometry filter on top of the source mask
        valid_r = (valid4 & rkeep).reshape(M4)
        extras_out["_rvalid"] = valid_r
    return img, boxes_out, valid.reshape(M4), extras_out


def _warp_masks(masks4, img_idx, y_loc, x_loc, S):
    """Warp per-instance binary masks through the same inverse map (nearest).

    masks4: (4, M, Sm, Sm). The image-resolution inverse map (img_idx, y_loc,
    x_loc) is downsampled to mask resolution by strided slicing, keeping mask
    and image geometry aligned (reference: instance masks ride cv2.warpAffine
    with the same matrix, augment.py:1046-1058).
    Returns (4M, Sm, Sm) float.
    """
    four, M, Sm, _ = masks4.shape
    r = S // Sm
    qi = img_idx[::r, ::r]                      # (Sm, Sm) source quadrant
    ys = jnp.round(y_loc[::r, ::r] / r).astype(jnp.int32)
    xs = jnp.round(x_loc[::r, ::r] / r).astype(jnp.int32)
    inb = (ys >= 0) & (ys < Sm) & (xs >= 0) & (xs < Sm)
    ysc, xsc = jnp.clip(ys, 0, Sm - 1), jnp.clip(xs, 0, Sm - 1)
    # gather all M instances of the chosen quadrant at once: (Sm, Sm, M)
    sampled = masks4[qi, :, ysc, xsc] * inb[..., None]
    quad = jax.nn.one_hot(qi, four, dtype=sampled.dtype)  # (Sm, Sm, 4)
    out = (quad[..., :, None] * sampled[..., None, :]).reshape(Sm, Sm, four * M)
    return jnp.transpose(out, (2, 0, 1))


def _warp_rboxes(rboxes4, oy, ox, A, offs, S):
    """Forward-transform rotated boxes: corners -> affine -> rect refit.

    rboxes4: (4, M, 5) normalized cx,cy,w,h,angle(rad). Exact under
    translate/scale/rotate (the mosaic+affine defaults); under shear the
    parallelogram is refit from its edge vectors. Returns ((4M,5), keep (4,M)).
    """
    cx = rboxes4[..., 0] * S + ox[:, None]
    cy = rboxes4[..., 1] * S + oy[:, None]
    w = rboxes4[..., 2] * S
    h = rboxes4[..., 3] * S
    ang = rboxes4[..., 4]
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # corners: c0 = center - w/2*e_w - h/2*e_h, going c0 -> c1 along width
    ex = jnp.stack([ca, sa], -1) * w[..., None] * 0.5       # (4,M,2)
    ey = jnp.stack([-sa, ca], -1) * h[..., None] * 0.5
    ctr = jnp.stack([cx, cy], -1)
    corners = jnp.stack([ctr - ex - ey, ctr + ex - ey, ctr + ex + ey, ctr - ex + ey], -2)
    ph = jnp.concatenate([corners - offs, jnp.ones_like(corners[..., :1])], -1)  # (4,M,4,3)
    out = ph @ A.T
    p = out[..., :2] / out[..., 2:3]                        # (4,M,4,2)
    e1 = p[..., 1, :] - p[..., 0, :]
    e2 = p[..., 3, :] - p[..., 0, :]
    w_new = jnp.linalg.norm(e1, axis=-1)
    h_new = jnp.linalg.norm(e2, axis=-1)
    ang_new = jnp.arctan2(e1[..., 1], e1[..., 0])
    # canonicalize to [0, pi/2): swap sides when needed (le90-style)
    ang_mod = ang_new % jnp.pi
    swap = ang_mod >= jnp.pi / 2
    w_c = jnp.where(swap, h_new, w_new)
    h_c = jnp.where(swap, w_new, h_new)
    ang_c = jnp.where(swap, ang_mod - jnp.pi / 2, ang_mod)
    ctr_new = jnp.mean(p, axis=-2)
    keep = (w_new > 2) & (h_new > 2) &            (ctr_new[..., 0] > 0) & (ctr_new[..., 0] < S) &            (ctr_new[..., 1] > 0) & (ctr_new[..., 1] < S)
    four, M = w_new.shape
    rb = jnp.stack([ctr_new[..., 0] / S, ctr_new[..., 1] / S, w_c / S, h_c / S, ang_c], -1)
    return rb.reshape(four * M, 5), keep


def _flip_rbox_angle(rboxes, do_flip):
    """Mirror rotated boxes in le90 form: angle a -> (-a) mod pi/2, and when
    the angle re-canonicalizes across the pi/2 boundary (a > 0) the w/h sides
    exchange — a mirrored rect's width axis lands on the original height axis.

    rboxes: (B, M, 5) cx,cy,w,h,angle with angle in [0, pi/2).
    do_flip: (B,) bool. Reference behavior: augment.py flips corners and
    refits, which performs this swap implicitly.
    """
    a = rboxes[..., 4]
    recanon = do_flip[:, None] & (a > 1e-7)
    ra = jnp.where(do_flip[:, None], (-a) % (jnp.pi / 2), a)
    rw = jnp.where(recanon, rboxes[..., 3], rboxes[..., 2])
    rh = jnp.where(recanon, rboxes[..., 2], rboxes[..., 3])
    return rboxes.at[..., 2].set(rw).at[..., 3].set(rh).at[..., 4].set(ra)


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
    """Random HSV jitter on [0,1] RGB (reference RandomHSV semantics).

    Exact identity when all gains are 0 (the reference's uint8 LUT is exactly
    identity there; the float RGB<->HSV round trip is not, and its sextant
    select amplifies tiny numeric diffs into channel swaps)."""
    if not (float(hyp.get("hsv_h", 0.015)) or float(hyp.get("hsv_s", 0.7))
            or float(hyp.get("hsv_v", 0.4))):
        return img01
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
def _augment_impl(images, cls, bboxes, mask, key, imgsz, mosaic, hyp_key,
                  keypoints=None, masks=None, rboxes=None):
    hyp = dict(hyp_key)
    B, S = images.shape[0], imgsz
    M = cls.shape[1]
    # single-source when mosaic is off (close_mosaic epochs): gathering 4
    # tiles only to mask 3 of them wastes 4x HBM traffic and label compute
    n_src = {9: 9, 3: 3}.get(mosaic, 4 if mosaic else 1)
    imgs_f = images.astype(jnp.float32)

    keys = jax.random.split(key, B * 4).reshape(B, 4, 2)

    # partner indices for mosaic (n_src-1 random others per image)
    kpart = jax.random.fold_in(key, 17)
    part = (jax.random.randint(kpart, (B, n_src - 1), 1, B) if B > 1
            else jnp.ones((B, n_src - 1), jnp.int32))
    base = jnp.arange(B)[:, None]
    sel = jnp.concatenate([base, (base + part) % B], axis=1)  # (B,n_src)

    quads = imgs_f[sel]  # (B,n,S,S,3)
    boxes4 = bboxes[sel]  # (B,n,M,4)
    cls4 = cls[sel].reshape(B, n_src * M)
    valid4 = mask[sel] > 0  # (B,n,M)

    extras = {}
    if keypoints is not None:
        extras["keypoints"] = keypoints[sel]  # (B,n,M,K,3)
    if masks is not None:
        extras["masks"] = masks[sel].astype(jnp.float32)  # (B,n,M,Sm,Sm)
    if rboxes is not None:
        extras["rboxes"] = rboxes[sel]  # (B,n,M,5)
    warp = jax.vmap(lambda q, b, v, ex, k: _warp_one(q, b, v, ex, k, S, hyp, mosaic))
    img, boxes_out, valid, ex_out = warp(quads, boxes4, valid4, extras, keys[:, 0])
    kpts_out = ex_out.get("keypoints")
    masks_out = ex_out.get("masks")
    rboxes_out = ex_out.get("rboxes")
    if rboxes_out is not None:
        valid = ex_out["_rvalid"]  # geometry filter from the rbox warp

    img01 = img / 255.0
    # Albumentations-analog photometric stack rides between mixup/copy-paste
    # and HSV in the reference compose order (augment.py:2278-2343); pixel-only,
    # so labels/masks are untouched
    from edgeyolo_tpu.data.photometric import bgr_swap_batch, photometric_batch

    img01 = photometric_batch(img01, jax.random.fold_in(key, 43), hyp)
    img01 = jax.vmap(lambda im, k: _hsv_aug(im, k, hyp))(img01, keys[:, 1])

    # copy-paste (segment task: instance masks required). Reference semantics
    # (augment.py:1634 CopyPaste, mode="flip"): mirror instances horizontally
    # within the image, keep candidates whose pasted box overlaps no existing
    # box by more than ioa 0.30, paste their pixels and append their labels.
    pcp = float(hyp.get("copy_paste", 0.0))
    if pcp > 0 and masks_out is not None and kpts_out is None and rboxes_out is None:
        from edgeyolo_tpu.ops.boxes import xywh2xyxy as _xyxy

        cp_mode = str(hyp.get("copy_paste_mode", "flip"))
        if cp_mode == "mixup" and B > 1:
            # mixup mode: candidates come from a PARTNER image's instances,
            # pasted via their masks (reference CopyPaste mode="mixup",
            # augment.py:1692-1731 — labels2 from another dataset sample)
            fboxes = jnp.roll(boxes_out, 1, axis=0)
            fmasks = jnp.roll(masks_out, 1, axis=0)
            fcls = jnp.roll(cls4, 1, axis=0)
            fvalid = jnp.roll(valid, 1, axis=0)
            src_img = jnp.roll(img01, 1, axis=0)
        else:
            # flip mode: mirror this image's instances horizontally
            fboxes = boxes_out.at[..., 0].set(1.0 - boxes_out[..., 0])  # (B,M,4)
            fmasks = masks_out[..., ::-1]  # (B,M,Sm,Sm)
            fcls = cls4
            fvalid = valid
            src_img = img01[:, :, ::-1, :]
        # ioa(candidate, existing) on normalized xywh
        a = _xyxy(fboxes)[:, :, None, :]   # (B,M,1,4) candidates
        bb = _xyxy(boxes_out)[:, None, :, :]  # (B,1,M,4) existing
        iw = jnp.clip(jnp.minimum(a[..., 2], bb[..., 2]) - jnp.maximum(a[..., 0], bb[..., 0]), 0)
        ih = jnp.clip(jnp.minimum(a[..., 3], bb[..., 3]) - jnp.maximum(a[..., 1], bb[..., 1]), 0)
        # intersection over the EXISTING box's area (reference bbox_ioa
        # divides by box2 = the labels already in the image) — dividing by the
        # candidate's own area lets a big candidate bury a small object
        area_e = jnp.clip(boxes_out[..., 2] * boxes_out[..., 3], 1e-9)
        ioa = iw * ih / area_e[:, None, :]  # (B,M,M) [cand, existing]
        ioa = jnp.where(valid[:, None, :], ioa, 0.0)
        elig = fvalid & (jnp.max(ioa, axis=-1) < 0.30)
        sel = elig & (jax.random.uniform(jax.random.fold_in(key, 23), valid.shape) < pcp)
        paste = jnp.max(fmasks * sel[..., None, None], axis=1)  # (B,Sm,Sm)
        paste = jax.image.resize(paste, (B, S, S), method="nearest")
        img01 = jnp.where((paste > 0.5)[..., None], src_img, img01)
        boxes_out = jnp.concatenate([boxes_out, fboxes], axis=1)
        cls4 = jnp.concatenate([cls4, fcls], axis=1)
        valid = jnp.concatenate([valid, sel], axis=1)
        masks_out = jnp.concatenate([masks_out, fmasks], axis=1)

    # horizontal flip (disabled when keypoints ride along: left/right kpt
    # semantics need a flip_idx remap, applied upstream when provided)
    pflip = 0.0 if kpts_out is not None else float(hyp.get("fliplr", 0.5))
    do_flip = jax.random.uniform(jax.random.fold_in(key, 29), (B,)) < pflip
    img01 = jnp.where(do_flip[:, None, None, None], img01[:, :, ::-1, :], img01)
    bx = jnp.where(do_flip[:, None], 1.0 - boxes_out[..., 0], boxes_out[..., 0])
    boxes_out = boxes_out.at[..., 0].set(bx)
    if masks_out is not None:
        masks_out = jnp.where(do_flip[:, None, None, None], masks_out[..., ::-1], masks_out)
    if rboxes_out is not None:
        rx = jnp.where(do_flip[:, None], 1.0 - rboxes_out[..., 0], rboxes_out[..., 0])
        rboxes_out = rboxes_out.at[..., 0].set(rx)
        rboxes_out = _flip_rbox_angle(rboxes_out, do_flip)
    # vertical flip
    pflipud = 0.0 if kpts_out is not None else float(hyp.get("flipud", 0.0))
    if pflipud > 0:
        do_f = jax.random.uniform(jax.random.fold_in(key, 31), (B,)) < pflipud
        img01 = jnp.where(do_f[:, None, None, None], img01[:, ::-1, :, :], img01)
        by = jnp.where(do_f[:, None], 1.0 - boxes_out[..., 1], boxes_out[..., 1])
        boxes_out = boxes_out.at[..., 1].set(by)
        if masks_out is not None:
            masks_out = jnp.where(do_f[:, None, None, None], masks_out[:, :, ::-1], masks_out)
        if rboxes_out is not None:
            ry = jnp.where(do_f[:, None], 1.0 - rboxes_out[..., 1], rboxes_out[..., 1])
            rboxes_out = rboxes_out.at[..., 1].set(ry)
            rboxes_out = _flip_rbox_angle(rboxes_out, do_f)

    # mixup (static gate on hyp; boxes-only labels)
    pmix = float(hyp.get("mixup", 0.0))
    if pmix > 0 and kpts_out is None and masks_out is None and rboxes_out is None:
        kmix = jax.random.fold_in(key, 37)
        do_mix = jax.random.uniform(kmix, (B,)) < pmix
        lam = jax.random.beta(jax.random.fold_in(key, 41), 32.0, 32.0, (B,))
        other = jnp.roll(jnp.arange(B), -1)
        mixed = lam[:, None, None, None] * img01 + (1 - lam)[:, None, None, None] * img01[other]
        img01 = jnp.where(do_mix[:, None, None, None], mixed, img01)
        boxes_out = jnp.concatenate([boxes_out, boxes_out[other]], axis=1)
        cls4 = jnp.concatenate([cls4, cls4[other]], axis=1)
        valid = jnp.concatenate([valid, valid[other] & do_mix[:, None]], axis=1)

    # Format-stage BGR swap (reference augment.py:2105) — last, like Format
    img01 = bgr_swap_batch(img01, jax.random.fold_in(key, 47), hyp)

    boxes_out = boxes_out * valid[..., None]
    extras_ret = {}
    if kpts_out is not None:
        extras_ret["keypoints"] = kpts_out
    if masks_out is not None:
        extras_ret["masks"] = masks_out * valid[:, :, None, None]
    if rboxes_out is not None:
        extras_ret["rboxes"] = rboxes_out * valid[..., None]
    if extras_ret:
        return img01, cls4, boxes_out, valid.astype(jnp.float32), extras_ret
    return img01, cls4, boxes_out, valid.astype(jnp.float32)


def augment_batch(images, cls, bboxes, mask, key, imgsz: int, hyp: dict, mosaic: bool = True,
                  keypoints=None, masks=None, rboxes=None):
    """Apply the fused augmentation program.

    images (B,S,S,3) uint8; cls (B,M); bboxes (B,M,4) normalized xywh;
    mask (B,M); optional extras all ride the same warp: keypoints (B,M,K,3)
    letterbox pixels (pose — flips auto-disabled without a flip_idx remap),
    masks (B,M,Sm,Sm) binary instance masks at S//Sm ratio, rboxes (B,M,5)
    normalized cx,cy,w,h,angle.
    Returns (images01 f32, cls (B,4M[*2]), bboxes, mask[, extras dict]); when
    only keypoints were passed the extras slot is the keypoints array itself
    (back-compat with the pose path).
    """
    hyp_key = tuple(sorted((k, v if isinstance(v, str) else float(v))
                           for k, v in hyp.items() if isinstance(v, (int, float, str))))
    out = _augment_impl(images, cls, bboxes, mask, key, imgsz, mosaic, hyp_key,
                        keypoints, masks, rboxes)
    if len(out) == 5 and keypoints is not None and masks is None and rboxes is None:
        return (*out[:4], out[4]["keypoints"])
    return out


def classify_augment_batch(images, key, hyp: dict):
    """Fused classification train-time augmentation on a uint8 (B,S,S,3) batch.

    TPU-native equivalent of classify_augmentations (reference
    augment.py:2403-2520): random-resized-crop with area scale
    (1 - hyp.scale, 1.0) and aspect ratio (3/4, 4/3), horizontal/vertical
    flips at fliplr/flipud, HSV jitter. Returns float images in [0, 1]
    (reference normalizes with mean 0 / std 1, i.e. plain /255).
    """
    B, S = images.shape[0], images.shape[1]
    smin = max(1.0 - float(hyp.get("scale", 0.5)), 0.05)
    img01 = images.astype(jnp.float32) / 255.0

    def rrc_one(im, k):
        k1, k2, k3 = jax.random.split(k, 3)
        area = jax.random.uniform(k1, (), minval=smin, maxval=1.0)
        logr = jax.random.uniform(k2, (), minval=jnp.log(3 / 4), maxval=jnp.log(4 / 3))
        ratio = jnp.exp(logr)
        cw = jnp.minimum(S * jnp.sqrt(area * ratio), S)
        ch = jnp.minimum(S * jnp.sqrt(area / ratio), S)
        off = jax.random.uniform(k3, (2,))
        oy = off[0] * (S - ch)
        ox = off[1] * (S - cw)
        ys = oy + (jnp.arange(S) + 0.5) / S * ch - 0.5
        xs = ox + (jnp.arange(S) + 0.5) / S * cw - 0.5
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return _bilinear_gather(im[None], jnp.zeros((S, S), jnp.int32), gy, gx)

    keys = jax.random.split(jax.random.fold_in(key, 11), B)
    img01 = jax.vmap(rrc_one)(img01, keys)
    pflip = float(hyp.get("fliplr", 0.5))
    if pflip > 0:
        do = jax.random.uniform(jax.random.fold_in(key, 13), (B,)) < pflip
        img01 = jnp.where(do[:, None, None, None], img01[:, :, ::-1, :], img01)
    pfud = float(hyp.get("flipud", 0.0))
    if pfud > 0:
        do = jax.random.uniform(jax.random.fold_in(key, 17), (B,)) < pfud
        img01 = jnp.where(do[:, None, None, None], img01[:, ::-1, :, :], img01)
    hkeys = jax.random.split(jax.random.fold_in(key, 19), B)
    img01 = jax.vmap(lambda im, k: _hsv_aug(im, k, hyp))(img01, hkeys)
    # RandAugment policy (reference classify default auto_augment=randaugment,
    # augment.py:2472-2520; device implementation in data/randaugment.py)
    if str(hyp.get("auto_augment", "")) == "randaugment":
        from edgeyolo_tpu.data.randaugment import rand_augment_batch

        img01 = rand_augment_batch(img01, jax.random.fold_in(key, 29))
    # RandomErasing (reference classify_augmentations appends
    # T.RandomErasing(p=erasing), augment.py:2403-2520; torchvision samples a
    # rect with area scale (0.02, 0.33) and log-uniform aspect (0.3, 3.3),
    # fill 0 — here clamped to fit instead of retry-sampled)
    per = float(hyp.get("erasing", 0.0))
    if per > 0:
        def erase_one(im, k):
            ka, kb, kc, kd = jax.random.split(k, 4)
            do = jax.random.uniform(ka, ()) < per
            area = jax.random.uniform(kb, (), minval=0.02, maxval=0.33) * S * S
            r = jnp.exp(jax.random.uniform(kc, (), minval=jnp.log(0.3), maxval=jnp.log(3.3)))
            eh = jnp.minimum(jnp.sqrt(area * r), S)
            ew = jnp.minimum(jnp.sqrt(area / r), S)
            off = jax.random.uniform(kd, (2,))
            oy, ox = off[0] * (S - eh), off[1] * (S - ew)
            yy = jnp.arange(S, dtype=jnp.float32)[:, None]
            xx = jnp.arange(S, dtype=jnp.float32)[None, :]
            inside = (yy >= oy) & (yy < oy + eh) & (xx >= ox) & (xx < ox + ew)
            return jnp.where((inside & do)[:, :, None], 0.0, im)

        ekeys = jax.random.split(jax.random.fold_in(key, 23), B)
        img01 = jax.vmap(erase_one)(img01, ekeys)
    return img01
