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
    """Detection boxes: data (N, 6) = [x1, y1, x2, y2, conf, cls] — or (N, 7)
    with a track id inserted after xyxy ([x1, y1, x2, y2, id, conf, cls],
    reference results.py:1007 is_track) — in pixels of the original image;
    orig_shape = (h, w)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        data = np.asarray(data, dtype=np.float32)
        ncol = data.shape[-1] if data.ndim > 1 and data.size else 6
        self.data = data.reshape(-1, ncol)
        self.is_track = ncol == 7
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Boxes(self.data[i], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

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


class Masks:
    """Instance masks at original-image resolution.

    data (n, h0, w0) bool/0-1; .xy / .xyn expose polygon segments (reference
    engine/results.py Masks — segments via ops.masks2segments).
    """

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Masks(np.atleast_3d(self.data[i]).reshape((-1, *self.data.shape[1:])), self.orig_shape)

    @property
    def xy(self) -> list[np.ndarray]:
        from edgeyolo_tpu.ops.segments import masks2segments

        return masks2segments(self.data)

    @property
    def xyn(self) -> list[np.ndarray]:
        h, w = self.orig_shape
        return [s / np.asarray([w, h], np.float32) for s in self.xy]


class Keypoints:
    """Pose keypoints: data (n, K, 2|3) pixel xy (+ visibility/conf)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return Keypoints(self.data[i].reshape((-1, *self.data.shape[1:])), self.orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.data[..., :2] / np.asarray([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class OBB:
    """Rotated boxes: data (n, 7) [cx, cy, w, h, angle(rad), conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return OBB(self.data[i], self.orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self) -> np.ndarray:
        """(n, 4, 2) corner points."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx = np.stack([w / 2 * cos, w / 2 * sin], -1)  # half-extent along box x
        dy = np.stack([-h / 2 * sin, h / 2 * cos], -1)
        c = np.stack([cx, cy], -1)
        return np.stack([c - dx - dy, c + dx - dy, c + dx + dy, c - dx + dy], 1)

    @property
    def xyxyxyxyn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xyxyxyxy / np.asarray([w, h], np.float32)

    @property
    def xyxy(self) -> np.ndarray:
        """Axis-aligned envelope of the corners (n, 4)."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(1), pts.max(1)], -1)


class Results:
    """Per-image prediction bundle."""

    def __init__(self, orig_img: np.ndarray, path: str, names: dict,
                 boxes: np.ndarray | None = None, probs: np.ndarray | None = None,
                 masks: np.ndarray | None = None, keypoints: np.ndarray | None = None,
                 obb: np.ndarray | None = None, speed: dict | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self):
        if self.obb is not None:
            return len(self.obb)
        return len(self.boxes) if self.boxes is not None else 0

    def __getitem__(self, i):
        r = Results(self.orig_img, self.path, self.names)
        for attr in ("boxes", "masks", "keypoints", "obb"):
            v = getattr(self, attr)
            if v is not None:
                setattr(r, attr, v[i])
        return r

    def update(self, boxes: np.ndarray | None = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        return self

    def save_crop(self, save_dir: str | Path, file_name: str | Path = "im.jpg"):
        """Save one crop per detection under save_dir/<class name>/ (reference
        results.py:720 — unsupported for classify/obb, gain=1.02 + 10px pad)."""
        if self.probs is not None or self.obb is not None:
            LOGGER.warning("save_crop is not supported for classify/obb results")
            return
        if self.boxes is None:
            return
        h, w = self.orig_shape
        stem, suffix = Path(file_name).stem, Path(file_name).suffix or ".jpg"
        for k, b in enumerate(self.boxes.data):
            x1, y1, x2, y2 = b[:4]
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            bw, bh = (x2 - x1) * 1.02 + 10, (y2 - y1) * 1.02 + 10  # reference save_one_box gain/pad
            xa = int(np.clip(cx - bw / 2, 0, w)); xb = int(np.clip(cx + bw / 2, 0, w))
            ya = int(np.clip(cy - bh / 2, 0, h)); yb = int(np.clip(cy + bh / 2, 0, h))
            if xb <= xa or yb <= ya:
                continue
            name = self.names.get(int(b[-1]), str(int(b[-1])))
            d = Path(save_dir) / name
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(self.orig_img[ya:yb, xa:xb].astype(np.uint8)).save(
                d / f"{stem}{'' if k == 0 else k}{suffix}")

    def plot(self, line_width: int | None = None, font_size: int | None = None,
             labels: bool = True, conf: bool = True) -> np.ndarray:
        """Draw boxes on a copy of the original image; returns HWC RGB uint8."""
        base = self.orig_img.astype(np.uint8)
        if self.masks is not None and len(self.masks):
            base = base.copy()
            for i, m in enumerate(self.masks.data):
                c = np.asarray(_colors(i), np.float32)
                sel = np.asarray(m) > 0.5
                base[sel] = (0.6 * base[sel] + 0.4 * c).astype(np.uint8)
        im = Image.fromarray(base).convert("RGB")
        draw = ImageDraw.Draw(im)
        lw = line_width or max(round(sum(im.size) / 2 * 0.003), 2)
        try:
            font = ImageFont.load_default(size=font_size or max(12, lw * 4))
        except TypeError:
            font = ImageFont.load_default()
        if self.keypoints is not None:
            for kp in self.keypoints.data:
                for k in kp:
                    if kp.shape[-1] < 3 or k[2] > 0.25:
                        draw.ellipse([k[0] - lw, k[1] - lw, k[0] + lw, k[1] + lw],
                                     fill=(0, 255, 0))
        if self.obb is not None:
            for pts, cf, c in zip(self.obb.xyxyxyxy, self.obb.conf, self.obb.cls):
                color = _colors(c)
                ring = [tuple(p) for p in pts] + [tuple(pts[0])]
                draw.line(ring, fill=color, width=lw)
                if labels:
                    name = self.names.get(int(c), str(int(c)))
                    text = f"{name} {cf:.2f}" if conf else name
                    draw.text((float(pts[0][0]), float(pts[0][1])), text, fill=color, font=font)
        if self.boxes is not None:
            ids = self.boxes.id
            for k, b in enumerate(self.boxes.data):
                x1, y1, x2, y2 = b[:4].tolist()
                cf, c = float(b[-2]), float(b[-1])
                color = _colors(c)
                draw.rectangle([x1, y1, x2, y2], outline=color, width=lw)
                if labels:
                    name = self.names.get(int(c), str(int(c)))
                    if ids is not None:
                        name = f"id:{int(ids[k])} {name}"
                    text = f"{name} {cf:.2f}" if conf else name
                    tb = draw.textbbox((x1, y1), text, font=font)
                    draw.rectangle([tb[0], tb[1] - 2, tb[2] + 2, tb[3]], fill=color)
                    draw.text((x1 + 1, y1 - 1), text, fill=(255, 255, 255), font=font)
        return np.asarray(im)

    def save(self, filename: str | Path, **plot_kwargs):
        Image.fromarray(self.plot(**plot_kwargs)).save(filename)
        return str(filename)

    def show(self, *a, **kw):
        """Display the annotated image (reference results.py:585; PIL viewer —
        a no-op on headless hosts)."""
        Image.fromarray(self.plot(*a, **kw)).show()

    def save_txt(self, txt_file: str | Path, save_conf: bool = False):
        """One line per instance, reference txt schema per task: detect
        `cls xywhn`, segment `cls poly-xyn`, pose `cls xywhn kpts-xyn(+conf)`,
        obb `cls corners-xyn` — each with trailing conf when save_conf."""
        lines = []
        if self.obb is not None:
            for pts, cf, c in zip(self.obb.xyxyxyxyn, self.obb.conf, self.obb.cls):
                vals = [int(c), *pts.reshape(-1).tolist()] + ([float(cf)] if save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if i else str(v) for i, v in enumerate(vals)))
        elif self.masks is not None and self.boxes is not None:
            for i, (b, seg) in enumerate(zip(self.boxes.data, self.masks.xyn)):
                if len(seg) < 3:  # degenerate/empty mask -> no polygon line
                    continue
                c, cf = int(b[-1]), float(b[-2])
                vals = [c, *seg.reshape(-1).tolist()] + ([cf] if save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if j else str(v) for j, v in enumerate(vals)))
        elif self.boxes is not None:
            kpn = self.keypoints.data if self.keypoints is not None else None
            h, w = self.orig_shape
            for i, (b, xywhn) in enumerate(zip(self.boxes.data, self.boxes.xywhn)):
                c, cf = int(b[-1]), float(b[-2])
                vals = [c, *xywhn.tolist()]
                if kpn is not None:
                    k = kpn[i].copy().astype(np.float64)
                    k[..., 0] /= w
                    k[..., 1] /= h
                    vals += k.reshape(-1).tolist()
                vals += [cf] if save_conf else []
                lines.append(" ".join(f"{v:.6g}" if j else str(v) for j, v in enumerate(vals)))
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
                    "name": self.names.get(int(b[-1]), str(int(b[-1]))),
                    "class": int(b[-1]), "confidence": float(b[-2]),
                    "box": {"x1": float(b[0]), "y1": float(b[1]), "x2": float(b[2]), "y2": float(b[3])},
                })
        return pd.DataFrame(rows)

    def to_json(self, normalize: bool = False):
        import json

        out = []
        h, w = self.orig_shape
        if self.boxes is not None:
            segs = (self.masks.xyn if normalize else self.masks.xy) if self.masks is not None else None
            for i, b in enumerate(self.boxes.data):
                x1, y1, x2, y2 = b[:4]
                if normalize:
                    x1, y1, x2, y2 = x1 / w, y1 / h, x2 / w, y2 / h
                row = {
                    "name": self.names.get(int(b[-1]), str(int(b[-1]))),
                    "class": int(b[-1]), "confidence": round(float(b[-2]), 5),
                    "box": {"x1": round(float(x1), 5), "y1": round(float(y1), 5),
                            "x2": round(float(x2), 5), "y2": round(float(y2), 5)},
                }
                if segs is not None:
                    s = segs[i]
                    row["segments"] = {"x": np.round(s[:, 0], 5).tolist(),
                                       "y": np.round(s[:, 1], 5).tolist()}
                if self.keypoints is not None:
                    k = self.keypoints.data[i]
                    kx, ky = (k[:, 0] / w, k[:, 1] / h) if normalize else (k[:, 0], k[:, 1])
                    row["keypoints"] = {"x": np.round(kx, 5).tolist(),
                                        "y": np.round(ky, 5).tolist()}
                    if k.shape[-1] == 3:
                        row["keypoints"]["visible"] = np.round(k[:, 2], 5).tolist()
                out.append(row)
        if self.obb is not None:
            pts_all = self.obb.xyxyxyxyn if normalize else self.obb.xyxyxyxy
            for pts, cf, c in zip(pts_all, self.obb.conf, self.obb.cls):
                out.append({
                    "name": self.names.get(int(c), str(int(c))),
                    "class": int(c), "confidence": round(float(cf), 5),
                    "points": [{"x": round(float(p[0]), 5), "y": round(float(p[1]), 5)}
                               for p in pts],
                })
        return json.dumps(out, indent=2)

    @property
    def verbose_str(self):
        src = self.obb if self.obb is not None else self.boxes
        if src is None or len(src) == 0:
            return "(no detections)"
        counts = {}
        for c in src.cls:
            counts[int(c)] = counts.get(int(c), 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}" for c, n in sorted(counts.items()))
