"""Box math: format conversion, IoU family, anchors, dist<->bbox.

Behavioral spec: ultralytics/utils/tal.py:333-385 (make_anchors, dist2bbox,
bbox2dist), ultralytics/utils/ops.py:396-620 (converters),
ultralytics/utils/metrics.py:74-235 (bbox_iou/CIoU, box_iou). All functions
are jit-safe: static shapes, no data-dependent control flow.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

EPS = 1e-7


# ----------------------------------------------------------------------------
# Format converters (last dim = 4)
# ----------------------------------------------------------------------------
def xyxy2xywh(x):
    xy = (x[..., :2] + x[..., 2:4]) / 2
    wh = x[..., 2:4] - x[..., :2]
    return jnp.concatenate([xy, wh], axis=-1)


def xywh2xyxy(x):
    xy, wh = x[..., :2], x[..., 2:4] / 2
    return jnp.concatenate([xy - wh, xy + wh], axis=-1)


def xywhn2xyxy(x, w: float, h: float, padw: float = 0.0, padh: float = 0.0):
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x * scale) + pad


def xyxy2xywhn(x, w: float, h: float, clip: bool = False, eps: float = 0.0):
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    y = xyxy2xywh(x)
    return y / jnp.asarray([w, h, w, h], dtype=x.dtype)


def ltwh2xyxy(x):
    xy = x[..., :2]
    return jnp.concatenate([xy, xy + x[..., 2:4]], axis=-1)


def xyxy2ltwh(x):
    return jnp.concatenate([x[..., :2], x[..., 2:4] - x[..., :2]], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True):
    """Rescale xyxy boxes from letterboxed img1_shape back to original img0_shape."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain, (pad_w, pad_h) = ratio_pad[0], ratio_pad[1]
    if padding:
        boxes = boxes - jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


# ----------------------------------------------------------------------------
# IoU family
# ----------------------------------------------------------------------------
def box_iou(box1, box2):
    """Pairwise IoU of two xyxy sets: (N,4) x (M,4) -> (N,M)."""
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)  # (N,1,2)
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)  # (1,M,2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + EPS)


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False, CIoU: bool = False):
    """Elementwise IoU/GIoU/DIoU/CIoU between broadcastable box tensors."""
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, axis=-1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, axis=-1)
        b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + EPS
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + EPS

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + EPS
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
        ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + EPS
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = v / (v - iou + (1 + EPS))
                alpha = jax.lax.stop_gradient(alpha)
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + EPS
        return iou - (c_area - union) / c_area
    return iou


# ----------------------------------------------------------------------------
# Anchors & DFL box geometry
# ----------------------------------------------------------------------------
def make_anchors(feat_shapes: Sequence[tuple[int, int]], strides: Sequence[int], grid_cell_offset: float = 0.5):
    """Anchor centers (in feature-grid units) and per-anchor strides.

    feat_shapes: [(H_i, W_i)] per level. Returns (anchor_points (A,2), strides (A,1)).
    """
    points, strds = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        strds.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(points), jnp.concatenate(strds)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """(l,t,r,b) distances + anchor centers -> boxes (xywh or xyxy)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """xyxy boxes -> clipped (l,t,r,b) distances for DFL targets."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1), 0, reg_max - 0.01
    )


def dist2rbox(distance, angle, anchor_points):
    """Rotated decode: ltrb distances + angle -> (cx, cy, w, h) with the
    center offset rotated by the angle (reference tal.py:367-385)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


def _covariance(boxes):
    """Gaussian covariance terms (a, b, c) of xywhr boxes (metrics.py:178)."""
    a = boxes[..., 2:3] ** 2 / 12.0
    b = boxes[..., 3:4] ** 2 / 12.0
    r = boxes[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Probabilistic IoU between xywhr rotated boxes (Hellinger-distance
    formulation; reference metrics.py:198-235). Elementwise/broadcastable."""
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0, None)
    t3 = jnp.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2) / (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1.0 - hd
    if CIoU:
        w1, h1 = obb1[..., 2:3], obb1[..., 3:4]
        w2, h2 = obb2[..., 2:3], obb2[..., 3:4]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def kpt_iou(kpt1, kpt2, area, sigma, eps: float = 1e-7):
    """OKS between keypoint sets: kpt1 (N,K,3) gt, kpt2 (M,K,2+) preds,
    area (N,) gt box areas (reference metrics.py:156)."""
    d = (kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2 + (kpt1[:, None, :, 1] - kpt2[None, :, :, 1]) ** 2
    sigma = jnp.asarray(sigma)
    kpt_mask = kpt1[..., 2] != 0  # (N,K)
    e = d / ((2 * sigma) ** 2) / (area[:, None, None] + eps) / 2
    return (jnp.exp(-e) * kpt_mask[:, None]).sum(-1) / (kpt_mask.sum(-1)[:, None] + eps)


def crop_mask(masks, boxes):
    """Zero mask pixels outside xyxy boxes. masks (N,H,W), boxes (N,4)."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (N,1,1)
    c = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    r = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    return masks * ((c >= x1) & (c < x2) & (r >= y1) & (r < y2))


def xywhr2xyxyxyxy(rbox):
    """(..., 5) [cx, cy, w, h, angle(rad)] -> (..., 4, 2) corner points
    (reference utils/ops.py xywhr2xyxyxyxy). numpy in, numpy out."""
    import numpy as _np

    rbox = _np.asarray(rbox, _np.float32)
    cx, cy, w, h, r = (rbox[..., i] for i in range(5))
    cos, sin = _np.cos(r), _np.sin(r)
    dx = _np.stack([w / 2 * cos, w / 2 * sin], -1)
    dy = _np.stack([-h / 2 * sin, h / 2 * cos], -1)
    c = _np.stack([cx, cy], -1)
    return _np.stack([c - dx - dy, c + dx - dy, c + dx + dy, c - dx + dy], -2)
