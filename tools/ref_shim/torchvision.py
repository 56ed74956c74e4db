"""Minimal torchvision shim for the reference's val path (ops.nms only).

The reference imports torchvision solely for ops.nms inside
non_max_suppression (ultralytics/utils/ops.py:214) and version metadata in
checks. Greedy NMS in pure torch reproduces torchvision.ops.nms exactly
(same sort + IoU>thresh suppression semantics).
"""

import torch

__version__ = "0.99.0"


def _nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float) -> torch.Tensor:
    order = scores.argsort(descending=True)
    keep = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long, device=boxes.device)


class ops:  # torchvision.ops namespace
    nms = staticmethod(_nms)


class _BatchedNMSModule:
    pass


# ---------------------------------------------------------------------------
# datasets.ImageFolder + transforms — enough surface for the reference's
# ClassificationDataset (data/dataset.py:391-470) and classify_transforms
# (data/augment.py:2340-2400). PIL-backed, matching torchvision's PIL
# semantics for Resize (shortest edge, BILINEAR) / CenterCrop / ToTensor /
# Normalize.
# ---------------------------------------------------------------------------
import sys as _sys
import types as _types
from pathlib import Path as _Path

_IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


class _ImageFolder:
    def __init__(self, root, allow_empty=True):
        root = _Path(root)
        self.classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples = [
            (str(f), self.class_to_idx[c])
            for c in self.classes
            for f in sorted((root / c).rglob("*"))
            if f.suffix.lower() in _IMG_EXT
        ]
        self.root = str(root)


datasets = _types.ModuleType("torchvision.datasets")
datasets.ImageFolder = _ImageFolder
_sys.modules["torchvision.datasets"] = datasets


class _InterpolationMode:
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


_PIL_INTERP = {"nearest": 0, "bilinear": 2, "bicubic": 3}


class _Resize:
    def __init__(self, size, interpolation="bilinear"):
        self.size = size
        self.interp = _PIL_INTERP.get(str(interpolation).lower().split(".")[-1], 2)

    def __call__(self, im):
        if isinstance(self.size, int):  # shortest-edge mode
            # real torchvision (_compute_resized_output_size) TRUNCATES the
            # long side: new_long = int(size * long / short)
            w, h = im.size
            if w <= h:
                nw, nh = self.size, max(1, int(self.size * h / w))
            else:
                nh, nw = self.size, max(1, int(self.size * w / h))
        else:
            nh, nw = self.size
        return im.resize((nw, nh), self.interp)


class _CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, im):
        th, tw = self.size
        w, h = im.size
        left = int(round((w - tw) / 2.0))
        top = int(round((h - th) / 2.0))
        return im.crop((left, top, left + tw, top + th))


class _ToTensor:
    def __call__(self, im):
        import numpy as _np

        a = _np.asarray(im, _np.float32) / 255.0
        if a.ndim == 2:
            a = a[..., None]
        return torch.from_numpy(a.transpose(2, 0, 1).copy())


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.as_tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.as_tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class _Compose:
    def __init__(self, ts):
        self.transforms = list(ts)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


transforms = _types.ModuleType("torchvision.transforms")
transforms.InterpolationMode = _InterpolationMode
transforms.Resize = _Resize
transforms.CenterCrop = _CenterCrop
transforms.ToTensor = _ToTensor
transforms.Normalize = _Normalize
transforms.Compose = _Compose
_sys.modules["torchvision.transforms"] = transforms
