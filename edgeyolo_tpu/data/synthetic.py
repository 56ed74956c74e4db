"""Synthetic detection dataset generator (zero-network substitute for coco8).

Draws colored geometric shapes on noise backgrounds with exact YOLO-format
labels, so end-to-end train/val/predict paths are testable offline — the
reference's tiny-dataset e2e strategy (SURVEY.md §4) without the download.
Class mapping: 0=rectangle, 1=ellipse, 2=cross.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

PALETTE = [(220, 40, 40), (40, 180, 60), (50, 80, 220), (230, 200, 40), (160, 60, 200)]


_SHAPES = ("rectangle", "ellipse", "cross")


def class_names(nc: int) -> list[str]:
    """Distinct name per class: (shape, color) pairs are unique for nc <= 15
    (3 shapes x 5 palette colors, coprime cycle lengths)."""
    if nc <= 3:
        return list(_SHAPES[:nc])
    return [f"{_SHAPES[c % 3]}_{c % len(PALETTE)}" for c in range(nc)]


def generate_dataset(
    root: str | Path,
    n_train: int = 16,
    n_val: int = 8,
    imgsz: int = 320,
    nc: int = 3,
    max_objs: int = 4,
    min_objs: int = 1,
    min_size: float = 0.15,
    max_size: float = 0.4,
    seed: int = 0,
    task: str = "detect",
) -> Path:
    """Create {root}/{images,labels}/{train,val} + dataset.yaml; returns yaml path.

    task selects the label format: detect (xywh), segment (polygons),
    pose (xywh + 5 keypoints: corners + center), obb (4-corner polygons).
    Classes are (shape, color) pairs — unique appearance for nc <= 15.
    The parity protocol (PARITY.md) uses the crowded form: min_objs/max_objs
    high, min_size/max_size small, nc >= 8, so per-detection mAP noise drops
    below the 0.02 gate.
    """
    root = Path(root)
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = Image.fromarray(
                (rng.rand(imgsz, imgsz, 3) * 60 + 90).astype(np.uint8)
            )
            draw = ImageDraw.Draw(img)
            lines = []
            for _ in range(rng.randint(min_objs, max_objs + 1)):
                c = int(rng.randint(0, nc))
                w = rng.uniform(min_size, max_size) * imgsz
                h = rng.uniform(min_size, max_size) * imgsz
                color = PALETTE[c % len(PALETTE)]
                S = imgsz
                if task == "obb":
                    # truly rotated instances — exercises probiou matching and
                    # rotated NMS, not just the angle=0 degenerate case
                    theta = rng.uniform(-np.pi / 3, np.pi / 3)
                    r = float(np.hypot(w, h)) / 2
                    cx = rng.uniform(r + 2, imgsz - r - 2)
                    cy = rng.uniform(r + 2, imgsz - r - 2)
                    ct, st = np.cos(theta), np.sin(theta)
                    rot = lambda dx, dy: (cx + dx * ct - dy * st, cy + dx * st + dy * ct)
                    corners = [rot(-w / 2, -h / 2), rot(w / 2, -h / 2),
                               rot(w / 2, h / 2), rot(-w / 2, h / 2)]
                    if c % 3 == 0:
                        draw.polygon(corners, fill=color, outline=(255, 255, 255))
                    elif c % 3 == 1:
                        mids = [rot(0, -h / 2), rot(w / 2, 0), rot(0, h / 2), rot(-w / 2, 0)]
                        draw.polygon(corners, outline=(255, 255, 255))
                        draw.polygon(mids, fill=color)
                    else:
                        draw.line([rot(-w / 2, 0), rot(w / 2, 0)], fill=color,
                                  width=max(3, int(h / 5)))
                        draw.line([rot(0, -h / 2), rot(0, h / 2)], fill=color,
                                  width=max(3, int(w / 5)))
                    pts = " ".join(f"{v/S:.6f}" for xy in corners for v in xy)
                    lines.append(f"{c} {pts}")
                    continue
                cx = rng.uniform(w / 2 + 2, imgsz - w / 2 - 2)
                cy = rng.uniform(h / 2 + 2, imgsz - h / 2 - 2)
                x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
                if c % 3 == 0:
                    draw.rectangle([x1, y1, x2, y2], fill=color, outline=(255, 255, 255))
                elif c % 3 == 1:
                    draw.ellipse([x1, y1, x2, y2], fill=color, outline=(255, 255, 255))
                else:
                    draw.line([x1, cy, x2, cy], fill=color, width=max(3, int(h / 5)))
                    draw.line([cx, y1, cx, y2], fill=color, width=max(3, int(w / 5)))
                if task == "segment":
                    corners = [x1, y1, x2, y1, x2, y2, x1, y2]
                    pts = " ".join(f"{v/S:.6f}" for v in corners)
                    lines.append(f"{c} {pts}")
                elif task == "pose":
                    kpts = [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (cx, cy)]
                    ks = " ".join(f"{px/S:.6f} {py/S:.6f} 2" for px, py in kpts)
                    lines.append(f"{c} {cx/S:.6f} {cy/S:.6f} {w/S:.6f} {h/S:.6f} {ks}")
                else:
                    lines.append(f"{c} {cx/S:.6f} {cy/S:.6f} {w/S:.6f} {h/S:.6f}")
            img.save(root / "images" / split / f"{split}_{i:04d}.jpg", quality=92)
            (root / "labels" / split / f"{split}_{i:04d}.txt").write_text("\n".join(lines) + "\n")
    yaml_path = root / "dataset.yaml"
    names = "\n".join(f"  {i}: {n}" for i, n in enumerate(class_names(nc)))
    extra = ""
    if task == "pose":
        # corners (TL,TR,BR,BL) + center; lr-flip swaps TL<->TR and BL<->BR
        # (reference pose datasets carry kpt_shape/flip_idx in the data yaml)
        extra = "kpt_shape: [5, 3]\nflip_idx: [1, 0, 3, 2, 4]\n"
    # always an absolute root: a relative `path:` would be re-joined against
    # the yaml's own directory by check_det_dataset (doubling the prefix when
    # the caller passed a cwd-relative root — tools/bench_table.py bug, r4)
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnc: {nc}\nnames:\n{names}\n{extra}"
    )
    return yaml_path


def generate_classify_dataset(
    root: str | Path,
    nc: int = 4,
    n_train_per_class: int = 8,
    n_val_per_class: int = 4,
    size_range: tuple[int, int] = (60, 140),
    noise: float = 60.0,
    seed: int = 0,
) -> Path:
    """ImageFolder-layout classification set: oriented-grating textures under
    heavy pixel noise (PARITY.md classify protocol: a solid-color set trains
    to top1=1.0 on both frameworks and cannot discriminate preprocessing
    bugs; gratings + noise give a mid-scale operating point). Every image is
    non-square with a random size so the shortest-edge-resize + center-crop
    eval transform is genuinely exercised. Returns the dataset root.
    """
    root = Path(root)
    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train_per_class), ("val", n_val_per_class)):
        for c in range(nc):
            d = root / split / f"grating_{c}"
            d.mkdir(parents=True, exist_ok=True)
            theta = c * np.pi / nc  # class = grating orientation
            for i in range(n):
                h = int(rng.randint(size_range[0], size_range[1] + 1))
                w = int(rng.randint(size_range[0], size_range[1] + 1))
                if h == w:
                    w += 3  # force non-square
                yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
                period = rng.uniform(8, 16)
                phase = rng.uniform(0, 2 * np.pi)
                g = np.sin((xx * np.cos(theta) + yy * np.sin(theta))
                           * (2 * np.pi / period) + phase)
                base = 127 + 70 * g
                im = base[..., None] + rng.normal(0, noise, (h, w, 3))
                Image.fromarray(np.clip(im, 0, 255).astype(np.uint8)).save(
                    d / f"{split}_{c}_{i:04d}.jpg", quality=92)
    return root
