"""FastSAM: segment-anything via a YOLOv8-seg everything model + prompt filters.

Behavioral spec: ultralytics/models/fastsam (model.py:11, predict.py) — the
model is a single-class YOLOv8-seg ("everything" proposals at high imgsz);
prompting filters the proposal set: bbox prompts by IoU, point prompts by
mask membership, text prompts by CLIP similarity (gated here: no CLIP
weights in this zero-egress image).
"""

from __future__ import annotations

import numpy as np

from edgeyolo_tpu.utils import LOGGER


def bbox_prompt(results, bboxes: np.ndarray, iou_thres: float = 0.0):
    """Keep the proposal best-overlapping each prompt box.

    results: list[Results] with .boxes; bboxes: (K, 4) xyxy prompt boxes.
    Returns per-result index arrays.
    """
    out = []
    for res in results:
        if res.boxes is None or len(res.boxes) == 0:
            out.append(np.zeros((0,), int))
            continue
        det = res.boxes.xyxy
        keep = []
        for pb in np.asarray(bboxes, np.float32).reshape(-1, 4):
            x1 = np.maximum(det[:, 0], pb[0])
            y1 = np.maximum(det[:, 1], pb[1])
            x2 = np.minimum(det[:, 2], pb[2])
            y2 = np.minimum(det[:, 3], pb[3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a_det = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
            a_pb = (pb[2] - pb[0]) * (pb[3] - pb[1])
            iou = inter / (a_det + a_pb - inter + 1e-7)
            if iou.max() > iou_thres:
                keep.append(int(iou.argmax()))
        out.append(np.unique(np.asarray(keep, int)))
    return out


def point_prompt(results, points: np.ndarray, labels: np.ndarray | None = None):
    """Keep proposals whose box contains the positive prompt points."""
    points = np.asarray(points, np.float32).reshape(-1, 2)
    labels = np.ones(len(points)) if labels is None else np.asarray(labels)
    out = []
    for res in results:
        if res.boxes is None or len(res.boxes) == 0:
            out.append(np.zeros((0,), int))
            continue
        det = res.boxes.xyxy
        keep = set()
        for (px, py), lab in zip(points, labels):
            inside = (det[:, 0] <= px) & (px <= det[:, 2]) & (det[:, 1] <= py) & (py <= det[:, 3])
            idxs = np.where(inside)[0]
            if len(idxs) == 0:
                continue
            areas = (det[idxs, 2] - det[idxs, 0]) * (det[idxs, 3] - det[idxs, 1])
            chosen = int(idxs[areas.argmin()])  # smallest containing proposal
            if lab > 0:
                keep.add(chosen)
            else:
                keep.discard(chosen)
        out.append(np.asarray(sorted(keep), int))
    return out


def text_prompt(results, text: str):
    """CLIP-similarity text prompting — requires CLIP weights, which cannot be
    fetched in this zero-egress environment."""
    raise NotImplementedError(
        "text prompts need CLIP embeddings; no pretrained weights are available "
        "in this offline image (bbox/point prompts are supported)"
    )


class FastSAM:
    """Facade: everything-mode proposals + prompt filtering."""

    def __init__(self, model: str = "fastsam.yaml"):
        from edgeyolo_tpu import YOLO

        self.yolo = YOLO(model, task="segment")

    def __call__(self, source, bboxes=None, points=None, labels=None, texts=None, **kw):
        kw.setdefault("imgsz", 640)
        kw.setdefault("conf", 0.25)
        results = self.yolo.predict(source, **kw)
        if texts is not None:
            text_prompt(results, texts)
        if bboxes is not None:
            sel = bbox_prompt(results, bboxes)
        elif points is not None:
            sel = point_prompt(results, points, labels)
        else:
            return results  # everything mode
        return [r[idx] for r, idx in zip(results, sel)]
