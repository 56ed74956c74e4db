"""Typed prediction containers (Results / Boxes) + PIL annotator.

Behavioral spec: ultralytics/engine/results.py:187 (Results), :938 (Boxes —
xyxy/xywh/conf/cls + normalized variants), plotting via utils/plotting.py
Annotator. Host-side numpy; device work ends at the NMS output.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from edgeyolo_tpu.utils import LOGGER


def _colors(i: int):
    palette = [
        (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29), (207, 210, 49),
        (72, 249, 10), (146, 204, 23), (61, 219, 134), (26, 147, 52), (0, 212, 187),
        (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255), (0, 24, 236),
        (132, 56, 255), (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
    ]
    return palette[int(i) % len(palette)]


class Boxes:
    """Detection boxes: data (N, 6) = [x1, y1, x2, y2, conf, cls] in pixels
    of the original image; orig_shape = (h, w)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, dtype=np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Boxes(self.data[i], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.concatenate([(b[:, :2] + b[:, 2:4]) / 2, b[:, 2:4] - b[:, :2]], axis=1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)


class Probs:
    """Classification probabilities container."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return self.data.argsort()[-5:][::-1].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())


class Results:
    """Per-image prediction bundle."""

    def __init__(self, orig_img: np.ndarray, path: str, names: dict,
                 boxes: np.ndarray | None = None, probs: np.ndarray | None = None,
                 speed: dict | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def __getitem__(self, i):
        r = Results(self.orig_img, self.path, self.names)
        if self.boxes is not None:
            r.boxes = self.boxes[i]
        return r

    def update(self, boxes: np.ndarray | None = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        return self

    def plot(self, line_width: int | None = None, font_size: int | None = None,
             labels: bool = True, conf: bool = True) -> np.ndarray:
        """Draw boxes on a copy of the original image; returns HWC RGB uint8."""
        im = Image.fromarray(self.orig_img.astype(np.uint8)).convert("RGB")
        draw = ImageDraw.Draw(im)
        lw = line_width or max(round(sum(im.size) / 2 * 0.003), 2)
        try:
            font = ImageFont.load_default(size=font_size or max(12, lw * 4))
        except TypeError:
            font = ImageFont.load_default()
        if self.boxes is not None:
            for b in self.boxes.data:
                x1, y1, x2, y2, cf, c = b.tolist()
                color = _colors(c)
                draw.rectangle([x1, y1, x2, y2], outline=color, width=lw)
                if labels:
                    name = self.names.get(int(c), str(int(c)))
                    text = f"{name} {cf:.2f}" if conf else name
                    tb = draw.textbbox((x1, y1), text, font=font)
                    draw.rectangle([tb[0], tb[1] - 2, tb[2] + 2, tb[3]], fill=color)
                    draw.text((x1 + 1, y1 - 1), text, fill=(255, 255, 255), font=font)
        return np.asarray(im)

    def save(self, filename: str | Path):
        Image.fromarray(self.plot()).save(filename)
        return str(filename)

    def save_txt(self, txt_file: str | Path, save_conf: bool = False):
        lines = []
        if self.boxes is not None:
            for b, xywhn in zip(self.boxes.data, self.boxes.xywhn):
                c, cf = int(b[5]), float(b[4])
                vals = [c, *xywhn.tolist()] + ([cf] if save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if i else str(v) for i, v in enumerate(vals)))
        if lines:
            Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
            with open(txt_file, "a") as f:
                f.write("\n".join(lines) + "\n")

    def to_df(self):
        import pandas as pd

        rows = []
        if self.boxes is not None:
            for b in self.boxes.data:
                rows.append({
                    "name": self.names.get(int(b[5]), str(int(b[5]))),
                    "class": int(b[5]), "confidence": float(b[4]),
                    "box": {"x1": float(b[0]), "y1": float(b[1]), "x2": float(b[2]), "y2": float(b[3])},
                })
        return pd.DataFrame(rows)

    def to_json(self, normalize: bool = False):
        import json

        out = []
        if self.boxes is not None:
            h, w = self.orig_shape
            for b in self.boxes.data:
                x1, y1, x2, y2 = b[:4]
                if normalize:
                    x1, y1, x2, y2 = x1 / w, y1 / h, x2 / w, y2 / h
                out.append({
                    "name": self.names.get(int(b[5]), str(int(b[5]))),
                    "class": int(b[5]), "confidence": round(float(b[4]), 5),
                    "box": {"x1": round(float(x1), 5), "y1": round(float(y1), 5),
                            "x2": round(float(x2), 5), "y2": round(float(y2), 5)},
                })
        return json.dumps(out, indent=2)

    @property
    def verbose_str(self):
        if self.boxes is None or len(self.boxes) == 0:
            return "(no detections)"
        counts = {}
        for c in self.boxes.cls:
            counts[int(c)] = counts.get(int(c), 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}" for c, n in sorted(counts.items()))
