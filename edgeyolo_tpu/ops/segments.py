"""Host-side mask post-processing: binary masks -> polygon segments.

Behavioral spec: ultralytics/utils/ops.py masks2segments (cv2.findContours
RETR_EXTERNAL + CHAIN_APPROX_SIMPLE, strategy 'all' concatenates every
contour, 'largest' keeps the longest). cv2 is probed, not assumed: without it
a numpy boundary-march produces an ordered outline of the largest component,
which is what the txt-export and annotator consumers need.
"""

from __future__ import annotations

import numpy as np

try:  # probe, never assume (image ships cv2 but users may not)
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover - exercised via _numpy_outline tests
    _HAS_CV2 = False


def _numpy_outline(mask: np.ndarray) -> np.ndarray:
    """Ordered outline of a binary mask without cv2: Moore boundary tracing
    around the largest 4-connected component. Returns (K, 2) float32 xy."""
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return np.zeros((0, 2), np.float32)
    pad = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), bool)
    pad[1:-1, 1:-1] = mask.astype(bool)
    # start: topmost-leftmost foreground pixel (its N and W neighbors are bg)
    sy, sx = int(ys.min() + 1), int(xs[ys == ys.min()].min() + 1)
    # 8-neighborhood clockwise: N NE E SE S SW W NW
    nbrs = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
    contour = [(sy, sx)]
    y, x = sy, sx
    py, px = sy, sx - 1  # backtrack: the bg pixel examined before entering (y,x)
    for _ in range(4 * mask.size):  # hard bound
        pi = nbrs.index((py - y, px - x))
        for k in range(1, 9):
            dy, dx = nbrs[(pi + k) % 8]
            ny, nx = y + dy, x + dx
            if pad[ny, nx]:
                by, bx = nbrs[(pi + k - 1) % 8]
                py, px = y + by, x + bx
                y, x = ny, nx
                break
        else:  # isolated pixel
            break
        if (y, x) == (sy, sx):
            break
        contour.append((y, x))
    return np.asarray(contour, np.float32)[:, ::-1] - 1.0  # yx -> xy, unpad


def masks2segments(masks, strategy: str = "all") -> list[np.ndarray]:
    """(N, H, W) bool/0-1 masks -> list of (K, 2) float32 xy polygons.

    strategy 'all' concatenates all external contours of a mask, 'largest'
    keeps only the longest (reference ops.py masks2segments semantics).
    """
    segments: list[np.ndarray] = []
    for m in np.asarray(masks):
        m8 = np.ascontiguousarray((np.asarray(m) > 0.5).astype(np.uint8))
        if _HAS_CV2:
            cs = cv2.findContours(m8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
            if cs:
                if strategy == "all":
                    c = np.concatenate([c.reshape(-1, 2) for c in cs])
                else:  # largest
                    c = np.asarray(cs[np.argmax([len(c) for c in cs])]).reshape(-1, 2)
            else:
                c = np.zeros((0, 2))
        else:
            c = _numpy_outline(m8)
        segments.append(c.astype(np.float32))
    return segments


def unletterbox_masks(masks: np.ndarray, pad: tuple[float, float],
                      orig_shape: tuple[int, int]) -> np.ndarray:
    """Undo letterboxing on (N, H, W) input-resolution masks: crop the pad
    region and resize to the original image shape (reference scale_masks,
    utils/ops.py). Returns (N, h0, w0) of the input dtype (bool stays bool)."""
    if masks.size == 0:
        return np.zeros((masks.shape[0], *orig_shape), masks.dtype)
    h, w = masks.shape[1:]
    pw, ph = pad
    x0, y0 = int(round(pw)), int(round(ph))
    x1, y1 = w - x0, h - y0
    cropped = masks[:, y0:y1, x0:x1].astype(np.float32)
    import jax.image as jimg

    out = np.asarray(jimg.resize(cropped, (masks.shape[0], *orig_shape), method="bilinear"))
    return (out > 0.5) if masks.dtype == bool else out.astype(masks.dtype)
