"""Classification dataset: folder-per-class layout + fixed-shape loader.

Behavioral spec: ultralytics/data/utils.py:394-470 (check_cls_dataset:
root/{train,val|validation|test}/<class>/*.jpg, names from sorted class
dirs) and data/dataset.py ClassificationDataset (torchvision-ImageFolder
equivalent). Host side does only decode + deterministic resize/center-crop
(classify_transforms, augment.py:2346-2401, crop_fraction 1.0, mean 0 /
std 1); the stochastic train-time transforms (random-resized-crop, flips,
HSV — classify_augmentations, augment.py:2403-2520) run fused on device in
classify_augment_batch (augment_device.py), keeping the hot path on the TPU.
"""

from __future__ import annotations

import queue as queue_mod
import random
import threading
from pathlib import Path

import numpy as np
from PIL import Image

from edgeyolo_tpu.data.letterbox import load_image_rgb
from edgeyolo_tpu.utils import LOGGER

IMG_EXTS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}


def check_cls_dataset(data: str | Path) -> dict:
    """Resolve a classification dataset root to {train, val, test, nc, names}."""
    root = Path(data)
    if not root.is_dir():
        raise FileNotFoundError(f"classification dataset root not found: {root}")
    train = root / "train"
    val = next((root / s for s in ("val", "validation") if (root / s).is_dir()), None)
    test = (root / "test") if (root / "test").is_dir() else None
    if not train.is_dir():
        # flat layout: root/<class>/* — use the same dir for train and val
        train = root
    if val is None:
        val = test or train
        LOGGER.warning(f"no val split under {root}; using {val.name or root} for val")
    classes = sorted(d.name for d in train.iterdir() if d.is_dir())
    names = dict(enumerate(classes))
    return {"train": str(train), "val": str(val), "test": str(test) if test else None,
            "nc": len(classes), "names": names}


def _resize_center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """Shortest-edge resize then center crop to (size, size) — the reference
    eval transform at crop_fraction=1.0 (augment.py:2378-2399, which is
    torchvision Resize + CenterCrop; torchvision's
    _compute_resized_output_size TRUNCATES the long side with int())."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = size, max(int(size * w / h), size)
    else:
        nw, nh = size, max(int(size * h / w), size)
    if (nw, nh) != (w, h):
        img = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    top = (nh - size) // 2
    left = (nw - size) // 2
    return img[top : top + size, left : left + size]


class ClassificationDataset:
    """Folder-per-class image dataset emitting fixed (S, S, 3) uint8 items."""

    def __init__(self, root: str | Path, imgsz: int = 224, augment: bool = False,
                 fraction: float = 1.0, names: dict | None = None):
        self.root = Path(root)
        self.imgsz = int(imgsz)
        self.augment = augment
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.names = names or dict(enumerate(classes))
        name_to_ix = {v: k for k, v in self.names.items()}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            ci = name_to_ix.get(c)
            if ci is None:
                continue
            files = sorted(p for p in (self.root / c).rglob("*") if p.suffix.lower() in IMG_EXTS)
            self.samples += [(str(p), ci) for p in files]
        if fraction < 1.0:
            self.samples = self.samples[: max(1, round(len(self.samples) * fraction))]
        if not self.samples:
            raise FileNotFoundError(f"no images under {self.root}")

    def __len__(self):
        return len(self.samples)

    def get_item(self, i: int) -> dict:
        path, ci = self.samples[i]
        img = _resize_center_crop(load_image_rgb(path), self.imgsz)
        return {"img": img, "cls": np.int64(ci), "im_file": path}


class ClassifyLoader:
    """Prefetching fixed-shape batch loader (mirror of dataset.DataLoader)."""

    def __init__(self, dataset: ClassificationDataset, batch_size: int = 16,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                 prefetch: int = 2):
        self.dataset = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def __iter__(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)

        def produce():
            for start in range(0, len(idx), self.bs):
                chunk = idx[start : start + self.bs]
                if self.drop_last and len(chunk) < self.bs:
                    break
                n_real = len(chunk)
                while len(chunk) < self.bs:
                    chunk.append(idx[(start + len(chunk)) % len(idx)])
                items = [self.dataset.get_item(j) for j in chunk]
                q.put({
                    "img": np.stack([it["img"] for it in items]),
                    "cls": np.stack([it["cls"] for it in items]),
                    "n_real": n_real,
                    "meta": items,
                })
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b
