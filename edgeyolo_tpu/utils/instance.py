"""Vectorized label containers: Bboxes and Instances.

Behavioral spec: ultralytics/utils/instance.py:34/185 — format-aware box
container (xyxy/xywh/ltwh) with scale/clip/area ops, and the composite
Instances (boxes + segments + keypoints) with flip/scale/denormalize used by
the augmentation pipeline. Host-side numpy.
"""

from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


def _xyxy2xywh(x):
    y = x.copy()
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def _xywh2xyxy(x):
    y = x.copy()
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def _ltwh2xyxy(x):
    y = x.copy()
    y[..., 2] = x[..., 0] + x[..., 2]
    y[..., 3] = x[..., 1] + x[..., 3]
    return y


def _xyxy2ltwh(x):
    y = x.copy()
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


class Bboxes:
    """Format-aware box container."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes.astype(np.float32)
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if format == self.format:
            return
        via = {"xyxy": lambda b: b, "xywh": _xywh2xyxy, "ltwh": _ltwh2xyxy}[self.format](self.bboxes)
        self.bboxes = {"xyxy": lambda b: b, "xywh": _xyxy2xywh, "ltwh": _xyxy2ltwh}[format](via)
        self.format = format

    def areas(self) -> np.ndarray:
        b = self.bboxes
        if self.format == "xyxy":
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return b[:, 2] * b[:, 3]

    def mul(self, scale):
        if isinstance(scale, (int, float)):
            scale = (scale,) * 4
        self.bboxes *= np.asarray(scale, np.float32)

    def add(self, offset):
        if isinstance(offset, (int, float)):
            offset = (offset,) * 4
        self.bboxes += np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, index) -> "Bboxes":
        b = self.bboxes[index]
        return Bboxes(b.reshape(-1, 4), self.format)

    @classmethod
    def concatenate(cls, boxes_list, axis: int = 0) -> "Bboxes":
        assert boxes_list
        fmt = boxes_list[0].format
        for b in boxes_list:
            b.convert(fmt)
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), fmt)


class Instances:
    """Boxes + segments + keypoints moving together through augmentation."""

    def __init__(self, bboxes, segments=None, keypoints=None, bbox_format="xywh", normalized=True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments if segments is not None else np.zeros((0, 0, 2), np.float32)
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format):
        self._bboxes.convert(format)

    def scale(self, scale_w, scale_h, bbox_only=False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if bbox_only:
            return
        if len(self.segments):
            self.segments[..., 0] *= scale_w
            self.segments[..., 1] *= scale_h
        if self.keypoints is not None:
            self.keypoints[..., 0] *= scale_w
            self.keypoints[..., 1] *= scale_h

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized, "add_padding expects absolute coordinates"
        self._bboxes.add((padw, padh, padw, padh))
        if len(self.segments):
            self.segments[..., 0] += padw
            self.segments[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def fliplr(self, w):
        if self._bboxes.format == "xyxy":
            x1 = self.bboxes[:, 0].copy()
            x2 = self.bboxes[:, 2].copy()
            self.bboxes[:, 0] = w - x2
            self.bboxes[:, 2] = w - x1
        else:
            self.bboxes[:, 0] = w - self.bboxes[:, 0]
        if len(self.segments):
            self.segments[..., 0] = w - self.segments[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def flipud(self, h):
        if self._bboxes.format == "xyxy":
            y1 = self.bboxes[:, 1].copy()
            y2 = self.bboxes[:, 3].copy()
            self.bboxes[:, 1] = h - y2
            self.bboxes[:, 3] = h - y1
        else:
            self.bboxes[:, 1] = h - self.bboxes[:, 1]
        if len(self.segments):
            self.segments[..., 1] = h - self.segments[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)
        if len(self.segments):
            self.segments[..., 0] = self.segments[..., 0].clip(0, w)
            self.segments[..., 1] = self.segments[..., 1].clip(0, h)
        if self.keypoints is not None:
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if len(self.segments):
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, index) -> "Instances":
        return Instances(
            self.bboxes[index].reshape(-1, 4),
            self.segments[index] if len(self.segments) else self.segments,
            self.keypoints[index] if self.keypoints is not None else None,
            self._bboxes.format,
            self.normalized,
        )
