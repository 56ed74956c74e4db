"""Letterbox preprocessing (host numpy path for val/predict).

Behavioral spec: ultralytics/data/augment.py LetterBox:1477-1634 —
ratio-preserving resize, gray-114 padding split half/half, optional
no-scaleup for val. TPU note: we always emit the static square (imgsz, imgsz)
shape (the reference's rect/auto mode trades shape-dynamism for speed, which
XLA-compiled inference does not want).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def letterbox(
    img: np.ndarray,
    new_shape: int | tuple[int, int] = 640,
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
):
    """Resize + pad an HWC uint8 image.

    Returns (padded image (nh, nw, 3), ratio, (pad_w, pad_h)).
    """
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(shape[1] * r), round(shape[0] * r))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = np.asarray(Image.fromarray(img).resize(new_unpad, Image.BILINEAR))
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out = np.full((new_shape[0], new_shape[1], img.shape[2] if img.ndim == 3 else 1), color, dtype=img.dtype)
    if img.ndim == 2:
        img = img[..., None]
    out[top : top + img.shape[0], left : left + img.shape[1]] = img
    return out, r, (left, top)


def load_image_rgb(path: str) -> np.ndarray:
    """Load an image file to HWC RGB uint8 (PIL; grey/RGBA normalized to RGB)."""
    im = Image.open(path)
    if im.mode != "RGB":
        im = im.convert("RGB")
    return np.asarray(im)
