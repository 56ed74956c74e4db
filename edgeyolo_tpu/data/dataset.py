"""YOLO-format dataset: file scanning, label caching, fixed-shape batches.

Behavioral spec: ultralytics/data/base.py:21-346 (globbing, fraction, class
filter, cache) and dataset.py:45-248 (label cache with hash, collate).
TPU-first deltas: batches are fully padded static shapes — images
(B, imgsz, imgsz, 3) uint8, labels (B, max_gt, 5) with a validity mask —
so the train step compiles once; heavy augmentation runs on device
(data/augment_device.py), the host only decodes and letterboxes.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import random
import threading
import queue as queue_mod
from pathlib import Path

import numpy as np

from edgeyolo_tpu.data.letterbox import letterbox, load_image_rgb
from edgeyolo_tpu.utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def img2label_path(img_path: str) -> str:
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def check_det_dataset(data: str | Path | dict) -> dict:
    """Parse a dataset YAML into {path, train, val, names, nc}."""
    if isinstance(data, (str, Path)):
        data = yaml_load(data, append_filename=True)
    data = dict(data)
    root = Path(data.get("path") or Path(data.get("yaml_file", ".")).parent)
    if not root.is_absolute():
        root = (Path(data.get("yaml_file", ".")).parent / root).resolve()
    for split in ("train", "val", "test"):
        if data.get(split):
            p = Path(data[split])
            data[split] = str(p if p.is_absolute() else root / p)
    names = data.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    data["names"] = {int(k): str(v) for k, v in (names or {}).items()}
    data["nc"] = data.get("nc") or len(data["names"])
    if not data["names"]:
        data["names"] = {i: f"class{i}" for i in range(data["nc"])}
    data["path"] = str(root)
    return data


class YOLODataset:
    """Detection dataset over YOLO-format .txt labels."""

    def __init__(
        self,
        img_path: str,
        imgsz: int = 640,
        augment: bool = False,
        hyp=None,
        rect: bool = False,
        single_cls: bool = False,
        classes=None,
        fraction: float = 1.0,
        max_gt: int | None = None,
        names: dict | None = None,
    ):
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.single_cls = single_cls
        self.names = names or {}
        self.im_files = self._scan_images(img_path, fraction)
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {img_path}")
        self.labels = self._load_labels()
        if classes is not None:
            self._filter_classes(classes)
        counts = [len(l["cls"]) for l in self.labels]
        # static per-dataset GT padding (multiple of 8, >= observed max)
        observed = max(counts) if counts else 1
        self.max_gt = max_gt or max(8, int(np.ceil(max(observed, 1) / 8) * 8))

    # -- indexing --------------------------------------------------------------
    def __len__(self):
        return len(self.im_files)

    @staticmethod
    def _scan_images(img_path: str, fraction: float) -> list[str]:
        p = Path(img_path)
        files: list[str] = []
        if p.is_dir():
            files = sorted(
                x for x in glob.glob(str(p / "**" / "*.*"), recursive=True)
                if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS
            )
        elif p.is_file() and p.suffix == ".txt":  # file list
            base = p.parent
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    q = Path(line)
                    files.append(str(q if q.is_absolute() else base / q))
            files.sort()
        elif p.is_file():
            files = [str(p)]
        if fraction < 1.0:
            files = files[: max(1, round(len(files) * fraction))]
        return files

    def _cache_path(self) -> Path:
        h = hashlib.sha1("".join(self.im_files).encode()).hexdigest()[:16]
        return Path(self.im_files[0]).parent.parent / f".edgeyolo_labels_{h}.json"

    def _load_labels(self):
        cache = self._cache_path()
        sig = [os.path.getmtime(f) if os.path.exists(f) else 0 for f in map(img2label_path, self.im_files)]
        if cache.exists():
            try:
                d = json.loads(cache.read_text())
                if d.get("sig") == sig:
                    return [
                        {"cls": np.asarray(l["cls"], np.float32), "bboxes": np.asarray(l["bboxes"], np.float32).reshape(-1, 4)}
                        for l in d["labels"]
                    ]
            except Exception:
                pass
        labels = []
        nm = nf = ne = nch = 0
        for f in self.im_files:
            lp = img2label_path(f)
            cls, boxes = [], []
            if os.path.exists(lp):
                for line in Path(lp).read_text().splitlines():
                    parts = line.split()
                    if len(parts) >= 5:
                        c = float(parts[0])
                        b = [float(x) for x in parts[1:5]]
                        if all(0 <= v <= 1 for v in b) and b[2] > 0 and b[3] > 0:
                            cls.append(c)
                            boxes.append(b)
                        else:
                            nch += 1
                nf += 1 if cls else 0
                ne += 0 if cls else 1
            else:
                nm += 1
            labels.append({"cls": np.asarray(cls, np.float32), "bboxes": np.asarray(boxes, np.float32).reshape(-1, 4)})
        LOGGER.info(f"dataset {self.img_path}: {len(self.im_files)} images, {nf} labelled, {ne} empty, {nm} missing labels, {nch} corrupt boxes dropped")
        try:
            cache.write_text(json.dumps({
                "sig": sig,
                "labels": [{"cls": l["cls"].tolist(), "bboxes": l["bboxes"].tolist()} for l in labels],
            }))
        except OSError:
            pass
        return labels

    def _filter_classes(self, classes):
        keep = set(classes)
        for l in self.labels:
            m = np.isin(l["cls"], list(keep))
            l["cls"], l["bboxes"] = l["cls"][m], l["bboxes"][m]

    # -- sample access -----------------------------------------------------------
    def get_item(self, i: int) -> dict:
        """One sample: letterboxed uint8 image + padded normalized-xywh labels."""
        img0 = load_image_rgb(self.im_files[i])
        h0, w0 = img0.shape[:2]
        img, r, (pw, ph) = letterbox(img0, self.imgsz, scaleup=self.augment)
        lab = self.labels[i]
        cls = lab["cls"].copy()
        boxes = lab["bboxes"].copy()  # normalized xywh in original space
        if self.single_cls:
            cls[:] = 0
        if len(boxes):
            # map to letterboxed normalized coords
            boxes = boxes * np.array([w0 * r, h0 * r, w0 * r, h0 * r]) / self.imgsz
            boxes[:, 0] += pw / self.imgsz
            boxes[:, 1] += ph / self.imgsz
        n = min(len(cls), self.max_gt)
        pc = np.zeros(self.max_gt, np.float32)
        pb = np.zeros((self.max_gt, 4), np.float32)
        pm = np.zeros(self.max_gt, np.float32)
        pc[:n], pb[:n], pm[:n] = cls[:n], boxes[:n], 1.0
        return {
            "img": img,
            "cls": pc,
            "bboxes": pb,
            "mask_gt": pm,
            "ori_shape": (h0, w0),
            "ratio_pad": (r, (pw, ph)),
            "im_file": self.im_files[i],
            "ori_cls": lab["cls"],
            "ori_bboxes": lab["bboxes"],  # normalized xywh, original space
        }


class DataLoader:
    """Minimal prefetching loader emitting fixed-shape numpy batches.

    Replaces torch DataLoader/InfiniteDataLoader (reference build.py:28-153):
    one background thread decodes ahead; SPMD sharding happens downstream.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int = 16, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 2):
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

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self):
        idx = self._indices()
        self.epoch += 1
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)

        def produce():
            for start in range(0, len(idx), self.bs):
                chunk = idx[start : start + self.bs]
                if self.drop_last and len(chunk) < self.bs:
                    break
                # pad final batch by wrapping (mask via n_real)
                n_real = len(chunk)
                while len(chunk) < self.bs:
                    chunk.append(idx[(start + len(chunk)) % len(idx)])
                items = [self.dataset.get_item(j) for j in chunk]
                batch = {
                    "img": np.stack([it["img"] for it in items]),
                    "cls": np.stack([it["cls"] for it in items]),
                    "bboxes": np.stack([it["bboxes"] for it in items]),
                    "mask_gt": np.stack([it["mask_gt"] for it in items]),
                    "n_real": n_real,
                    "meta": items,
                }
                q.put(batch)
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                return
            yield b


def build_dataloader(dataset, batch_size, shuffle=True, seed=0, drop_last=False):
    return DataLoader(dataset, batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last)
