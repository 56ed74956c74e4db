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


_NATIVE_IO = None


def _native_io_enabled() -> bool:
    """Native C++ JPEG decode+letterbox: auto-on for multi-core hosts, forced
    with EDGEYOLO_NATIVE_IO=1, off with =0 (single-core boxes keep PIL —
    libjpeg-turbo's SIMD resize wins there)."""
    global _NATIVE_IO
    if _NATIVE_IO is None:
        mode = os.environ.get("EDGEYOLO_NATIVE_IO", "auto")
        if mode == "0":
            _NATIVE_IO = False
        else:
            try:
                from edgeyolo_tpu import native as _native

                cores = len(os.sched_getaffinity(0))
                _NATIVE_IO = _native.available() and (mode == "1" or cores > 1)
            except Exception:
                _NATIVE_IO = False
    return _NATIVE_IO


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
        task: str = "detect",
        kpt_shape: tuple[int, int] = (17, 3),
        mask_ratio: int = 4,
        cache: bool | str = False,
    ):
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        # RAM image cache (reference base.py:89-101 cache="ram"): memoize the
        # decoded+letterboxed image per (index, target shape); labels are
        # recomputed per call (cheap). "disk" is unnecessary here — the label
        # cache already persists, and decode is the native fast path.
        self.cache_ram = str(cache).lower() in ("true", "ram", "1")
        self._im_cache: dict = {}
        self.rect = bool(rect) and not augment
        self._rect_shape = None
        self.single_cls = single_cls
        self.names = names or {}
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.mask_ratio = mask_ratio
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

    def _verify_images(self):
        """Image corruption verification (reference verify_image_label,
        data/utils.py:97): header-only PIL verify + minimum size; corrupt
        files are dropped from the epoch rather than crashing mid-train.
        Runs BEFORE the cache check so cached labels always align with the
        filtered file list."""
        from PIL import Image as _Image

        good = []
        for f in self.im_files:
            try:
                with _Image.open(f) as im:
                    im.verify()
                    w0, h0 = im.size
                assert w0 >= 10 and h0 >= 10, f"image too small {w0}x{h0}"
                good.append(f)
            except Exception as e:
                LOGGER.warning(f"dropping corrupt image {f}: {e}")
        self.im_files = good
        if not self.im_files:
            raise FileNotFoundError(f"all images under {self.img_path} failed verification")

    def _load_labels(self):
        self._verify_images()
        cache = self._cache_path()
        # "v2": cache format version — bumped when parsing semantics change
        # (v2: per-instance segment/kpt arrays are index-aligned with cls)
        sig = ["v2"] + [os.path.getmtime(f) if os.path.exists(f) else 0
                        for f in map(img2label_path, self.im_files)]
        if cache.exists():
            try:
                d = json.loads(cache.read_text())
                if d.get("sig") == sig and d.get("task") == self.task:
                    K = self.kpt_shape[0]
                    return [
                        {"cls": np.asarray(l["cls"], np.float32),
                         "bboxes": np.asarray(l["bboxes"], np.float32).reshape(-1, 4),
                         "segments": [np.asarray(sg, np.float32).reshape(-1, 2)
                                      for sg in l.get("segments", [])],
                         "keypoints": (np.asarray(l["keypoints"], np.float32).reshape(-1, K, 3)
                                       if l.get("keypoints") else np.zeros((0, K, 3), np.float32))}
                        for l in d["labels"]
                    ]
            except Exception:
                pass
        labels = []
        nm = nf = ne = nch = 0
        K, D = self.kpt_shape
        for f in self.im_files:
            lp = img2label_path(f)
            cls, boxes, segments, kpts = [], [], [], []
            if os.path.exists(lp):
                for line in Path(lp).read_text().splitlines():
                    parts = line.split()
                    if len(parts) < 5:
                        continue
                    c = float(parts[0])
                    vals = [float(x) for x in parts[1:]]
                    kp = seg = None
                    if self.task == "pose" and len(vals) == 4 + K * D:
                        b = vals[:4]
                        kp = np.asarray(vals[4:], np.float32).reshape(K, D)
                        if D == 2:
                            kp = np.concatenate([kp, 2 * np.ones((K, 1), np.float32)], 1)
                    elif len(vals) > 5 and len(vals) % 2 == 0:
                        # polygon: x1 y1 ... xn yn (obb = 4-corner special case)
                        poly = np.asarray(vals, np.float32).reshape(-1, 2)
                        seg = poly
                        x1, y1 = poly[:, 0].min(), poly[:, 1].min()
                        x2, y2 = poly[:, 0].max(), poly[:, 1].max()
                        b = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]
                    else:
                        b = vals[:4]
                    if all(0 <= v <= 1.001 for v in b) and b[2] > 0 and b[3] > 0:
                        cls.append(c)
                        boxes.append(b)
                        # keep the per-instance arrays index-aligned with cls:
                        # pose lines always push a kpt row (zeros when the line
                        # had no kpt payload); segment/obb lines always push a
                        # polygon (box corners when the line was box-only)
                        if self.task == "pose":
                            kpts.append(kp if kp is not None
                                        else np.zeros((K, 3), np.float32))
                        if self.task in ("segment", "obb"):
                            segments.append(seg if seg is not None else np.asarray(
                                [[b[0] - b[2] / 2, b[1] - b[3] / 2],
                                 [b[0] + b[2] / 2, b[1] - b[3] / 2],
                                 [b[0] + b[2] / 2, b[1] + b[3] / 2],
                                 [b[0] - b[2] / 2, b[1] + b[3] / 2]], np.float32))
                        elif seg is not None:
                            segments.append(seg)
                    else:
                        nch += 1
                nf += 1 if cls else 0
                ne += 0 if cls else 1
            else:
                nm += 1
            labels.append({
                "cls": np.asarray(cls, np.float32),
                "bboxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                "segments": segments,
                "keypoints": np.asarray(kpts, np.float32).reshape(-1, K, 3) if kpts else np.zeros((0, K, 3), np.float32),
            })
        LOGGER.info(f"dataset {self.img_path}: {len(self.im_files)} images, {nf} labelled, {ne} empty, {nm} missing labels, {nch} corrupt boxes dropped")
        try:
            cache.write_text(json.dumps({
                "sig": sig,
                "task": self.task,
                "labels": [{"cls": l["cls"].tolist(), "bboxes": l["bboxes"].tolist(),
                            "segments": [np.asarray(sg).tolist() for sg in (l["segments"] or [])],
                            "keypoints": np.asarray(l["keypoints"]).tolist()
                            if len(l["keypoints"]) else []}
                           for l in labels],
            }))
        except OSError:
            pass
        return labels

    def _filter_classes(self, classes):
        keep = set(classes)
        for l in self.labels:
            m = np.isin(l["cls"], list(keep))
            # per-instance arrays must stay index-aligned with cls
            if len(l["segments"]) == len(l["cls"]):
                l["segments"] = [s for s, k in zip(l["segments"], m) if k]
            if len(l["keypoints"]) == len(l["cls"]):
                l["keypoints"] = l["keypoints"][m]
            l["cls"], l["bboxes"] = l["cls"][m], l["bboxes"][m]

    # -- sample access -----------------------------------------------------------
    def set_rectangle(self, batch_size: int):
        """Rect val batching: sort by aspect ratio, assign a per-batch canvas
        shape (reference base.py:261-279). TPU twist: shapes quantize up to
        multiples of 64 so the whole val run compiles at most a handful of
        XLA programs instead of one per batch."""
        shapes = []
        for f in self.im_files:
            from PIL import Image as _Image

            with _Image.open(f) as im:  # header-only read
                w, h = im.size
            shapes.append((h, w))
        ar = np.asarray([h / w for h, w in shapes], np.float64)
        order = np.argsort(ar).tolist()
        self.im_files = [self.im_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        ar = ar[order]
        n = len(ar)
        self._rect_shape = [None] * n
        for b in range(0, n, batch_size):
            sl = ar[b : b + batch_size]
            shape = [1.0, 1.0]
            if sl.max() < 1:
                shape = [float(sl.max()), 1.0]
            elif sl.min() > 1:
                shape = [1.0, float(1 / sl.min())]
            H = int(np.ceil(shape[0] * self.imgsz / 64) * 64)
            W = int(np.ceil(shape[1] * self.imgsz / 64) * 64)
            for i in range(b, min(b + batch_size, n)):
                self._rect_shape[i] = (H, W)
        self.rect = True

    def get_item(self, i: int) -> dict:
        """One sample: letterboxed uint8 image + padded normalized-xywh labels."""
        target = self._rect_shape[i] if (self.rect and self._rect_shape) else self.imgsz
        path = self.im_files[i]
        ck = (i, target)
        if self.cache_ram and ck in self._im_cache:
            img, r, (pw, ph), (h0, w0) = self._im_cache[ck]
        elif (isinstance(target, int) and path.lower().endswith((".jpg", ".jpeg"))
                and _native_io_enabled()):
            # native runtime fast path: threaded libjpeg decode + letterbox in
            # C++ (edgeyolo_tpu/native); pixel-equivalent to the PIL path
            from edgeyolo_tpu import native as _native

            img, r, (pw, ph), (h0, w0) = _native.decode_letterbox(
                path, target, scaleup=self.augment)
        else:
            img0 = load_image_rgb(path)
            h0, w0 = img0.shape[:2]
            img, r, (pw, ph) = letterbox(img0, target, scaleup=self.augment)
        if self.cache_ram and ck not in self._im_cache:
            self._im_cache[ck] = (img, r, (pw, ph), (h0, w0))
        H, W = img.shape[:2]
        lab = self.labels[i]
        cls = lab["cls"].copy()
        boxes = lab["bboxes"].copy()  # normalized xywh in original space
        if self.single_cls:
            cls[:] = 0
        if len(boxes):
            # map to letterboxed normalized coords
            boxes = boxes * np.array([w0 * r / W, h0 * r / H, w0 * r / W, h0 * r / H])
            boxes[:, 0] += pw / W
            boxes[:, 1] += ph / H
        n = min(len(cls), self.max_gt)
        pc = np.zeros(self.max_gt, np.float32)
        pb = np.zeros((self.max_gt, 4), np.float32)
        pm = np.zeros(self.max_gt, np.float32)
        pc[:n], pm[:n] = cls[:n], 1.0
        if n:
            pb[:n] = boxes[:n]
        item = {
            "img": img,
            "cls": pc,
            "bboxes": pb,
            "mask_gt": pm,
            "ori_shape": (h0, w0),
            "ratio_pad": (r, (pw, ph)),
            "im_file": self.im_files[i],
            "ori_cls": cls,  # single_cls-mapped copy (== lab["cls"] otherwise)
            "ori_bboxes": lab["bboxes"],  # normalized xywh, original space
        }
        if self.task == "segment":
            item["masks"] = self._rasterize_masks(lab.get("segments") or [], n, w0, h0, r, pw, ph,
                                                  H, W)
        elif self.task == "pose":
            K, _ = self.kpt_shape
            pk = np.zeros((self.max_gt, K, 3), np.float32)
            kp = lab["keypoints"]
            if len(kp):
                kpx = kp[:n].copy()
                kpx[..., 0] = kpx[..., 0] * w0 * r + pw  # to letterbox pixels
                kpx[..., 1] = kpx[..., 1] * h0 * r + ph
                pk[: len(kpx)] = kpx
            item["keypoints"] = pk
        elif self.task == "obb":
            # fit the min-area rect in ORIGINAL PIXEL space (a normalized-
            # coordinate fit is anisotropically squashed whenever w0 != h0,
            # corrupting w/h/angle of every rotated box), then map through the
            # letterbox (uniform scale r + pad translate: shape-preserving)
            pr = np.zeros((self.max_gt, 5), np.float32)       # letterbox frame, /W /H normalized
            pr_ori = np.zeros((self.max_gt, 5), np.float32)   # original frame, pixels
            segs = lab.get("segments") or []
            for j, poly in enumerate(segs[:n]):
                rb = _poly2rbox(poly * np.asarray([w0, h0], np.float32))
                pr_ori[j] = rb
                pr[j] = [(rb[0] * r + pw) / W, (rb[1] * r + ph) / H,
                         rb[2] * r / W, rb[3] * r / H, rb[4]]
            item["rboxes"] = pr
            item["rboxes_ori"] = pr_ori
        return item

    def _rasterize_masks(self, segments, n, w0, h0, r, pw, ph, H=None, W=None):
        """Polygons (normalized, original space) -> (max_gt, H/ratio, W/ratio).

        Mirrors the reference's polygon2mask (data/utils.py:250-271) exactly
        when cv2 is importable: cv2.fillPoly at FULL input resolution with
        int-truncated coords, then cv2.resize to imgsz/ratio. The scan-fill
        boundary convention matters: PIL's polygon fill differs from
        cv2.fillPoly by a ring of boundary pixels, which at proto resolution
        (80x80 at 320px input) moved mask IoUs of small crowded instances
        across whole mAP thresholds (round-4 segment parity, PARITY.md).
        A PIL emulation (fill + the INTER_LINEAR integer-ratio tap pattern)
        remains as the no-cv2 fallback."""
        H = H or self.imgsz
        W = W or self.imgsz
        rr = self.mask_ratio
        sh, sw = H // rr, W // rr
        out = np.zeros((self.max_gt, sh, sw), np.float32)
        try:
            import cv2
        except ImportError:
            cv2 = None
        for j, poly in enumerate(segments[:n]):
            pts = poly.copy()
            pts[:, 0] = pts[:, 0] * w0 * r + pw
            pts[:, 1] = pts[:, 1] * h0 * r + ph
            pts = pts.astype(np.int32)  # reference truncates (np.int32 cast)
            if cv2 is not None:
                m = np.zeros((H, W), np.uint8)
                cv2.fillPoly(m, [pts.reshape(-1, 2)], color=1)
                out[j] = cv2.resize(m, (sw, sh)).astype(np.float32)
                continue
            from PIL import Image, ImageDraw

            im = Image.new("L", (W, H), 0)
            ImageDraw.Draw(im).polygon([tuple(p) for p in pts.tolist()], fill=1)
            full = np.asarray(im, np.float32)
            if rr == 1:
                out[j] = full[:sh * rr, :sw * rr]
                continue
            c = (rr - 1) / 2.0  # src offset of dst pixel 0 under INTER_LINEAR
            lo = int(np.floor(c))
            if c == lo:  # odd ratio: exact single-tap sampling
                out[j] = full[lo::rr, lo::rr][:sh, :sw]
            else:  # even ratio: 2x2 average, cv2 fixed-point rounds .5 up
                s = (full[lo::rr, lo::rr][:sh, :sw] + full[lo + 1::rr, lo::rr][:sh, :sw]
                     + full[lo::rr, lo + 1::rr][:sh, :sw]
                     + full[lo + 1::rr, lo + 1::rr][:sh, :sw])
                out[j] = (s >= 2.0).astype(np.float32)
        if n > 1:
            # overlap_mask=True semantics (the reference default): instances
            # are merged into one index map drawn area-descending with clip,
            # so an overlapped pixel belongs to the LAST-drawn (smallest)
            # covering instance (polygons2masks_overlap, data/utils.py:257).
            # Both the seg loss (reference loss.py:486 `masks == idx+1`) and
            # the val TP matching (segment/val.py overlap=True) consume these
            # exclusive masks; replicate the exact drawing order incl. ties.
            areas = out[:n].reshape(n, -1).sum(1)
            order = np.argsort(-areas, kind="stable")
            merged = np.zeros((sh, sw), np.int32)
            for rank, j in enumerate(order):
                merged = np.clip(merged + out[j].astype(np.int32) * (rank + 1), 0, rank + 1)
            for rank, j in enumerate(order):
                out[j] = (merged == rank + 1).astype(np.float32)
        return out


class DataLoader:
    """Minimal prefetching loader emitting fixed-shape numpy batches.

    Replaces torch DataLoader/InfiniteDataLoader (reference build.py:28-153):
    one background thread decodes ahead; SPMD sharding happens downstream.
    """

    def __init__(self, dataset: YOLODataset, batch_size: int = 16, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 2,
                 shard_rank: int = 0, shard_count: int = 1):
        self.dataset = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.prefetch = prefetch
        # multi-host: each process iterates a disjoint stride of the (same-
        # seed, identically shuffled) index space — the DistributedSampler
        # analog; batch_size is then the PER-HOST batch
        self.shard_rank = shard_rank
        self.shard_count = max(shard_count, 1)

    def __len__(self):
        n = len(self.dataset)
        if self.shard_count > 1:
            n = n // self.shard_count  # truncated so every host steps in lockstep
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.shard_count > 1:
            # truncate to a multiple of shard_count: every host sees the SAME
            # number of batches (an uneven tail would desync the SPMD loop and
            # hang the collectives)
            idx = idx[: len(idx) - len(idx) % self.shard_count]
            idx = idx[self.shard_rank :: self.shard_count]
        return idx

    def _collate(self, chunk: list[int]) -> dict:
        # pad final batch by repeating its last item (masked via n_real;
        # repeating keeps rect batches shape-homogeneous)
        n_real = len(chunk)
        chunk = chunk + [chunk[-1]] * (self.bs - len(chunk))
        items = [self.dataset.get_item(j) for j in chunk]
        batch = {
            "img": np.stack([it["img"] for it in items]),
            "cls": np.stack([it["cls"] for it in items]),
            "bboxes": np.stack([it["bboxes"] for it in items]),
            "mask_gt": np.stack([it["mask_gt"] for it in items]),
            "n_real": n_real,
            "meta": items,
        }
        for extra in ("masks", "keypoints", "rboxes"):
            if extra in items[0]:
                batch[extra] = np.stack([it[extra] for it in items])
        return batch

    def first_batch(self) -> dict:
        """Materialize batch 0 synchronously — no prefetch thread, no epoch
        advance. For one-shot consumers (int8 calibration) that would
        otherwise strand a producer thread blocked on the queue."""
        return self._collate(self._indices()[: self.bs])

    def __iter__(self):
        idx = self._indices()
        self.epoch += 1
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)

        def produce():
            try:
                for start in range(0, len(idx), self.bs):
                    chunk = idx[start : start + self.bs]
                    if self.drop_last and len(chunk) < self.bs:
                        break
                    q.put(self._collate(chunk))
                q.put(None)
            except BaseException as e:  # decode error mid-epoch: surface it on
                q.put(e)                # the consumer, never hang it on q.get()

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is None:
                return
            if isinstance(b, BaseException):
                raise b
            yield b


def build_dataloader(dataset, batch_size, shuffle=True, seed=0, drop_last=False,
                     shard_rank=0, shard_count=1):
    return DataLoader(dataset, batch_size, shuffle=shuffle, seed=seed, drop_last=drop_last,
                      shard_rank=shard_rank, shard_count=shard_count)


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; pts (N, 2) -> hull (M, 2) counter-clockwise."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def _poly2rbox(poly: np.ndarray) -> np.ndarray:
    """Polygon (PIXEL coords) -> (cx, cy, w, h, r) min-area rect.

    Full rotating-calipers minimum-area rectangle over the convex hull (the
    reference uses cv2.minAreaRect; this is its numpy equivalent, exact for
    skewed/non-rectangular DOTA quads — not just near-rectangles).
    """
    p = poly.reshape(-1, 2).astype(np.float64)
    hull = _convex_hull(p)
    if len(hull) < 3:  # degenerate: line or point
        c = p.mean(0)
        d = p.max(0) - p.min(0)
        return np.asarray([c[0], c[1], max(d[0], 1e-6), max(d[1], 1e-6), 0.0], np.float32)
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        norm = np.hypot(e[0], e[1])
        if norm < 1e-12:
            continue
        ux, uy = e / norm                      # edge direction
        R = np.asarray([[ux, uy], [-uy, ux]])  # rotate edge onto +x
        q = hull @ R.T
        mn, mx = q.min(0), q.max(0)
        w, h = mx - mn
        area = w * h
        if best is None or area < best[0]:
            cx, cy = (mn + mx) / 2 @ R          # un-rotate the center
            ang = np.arctan2(uy, ux)
            best = (area, cx, cy, w, h, ang)
    _, cx, cy, w, h, r = best
    # canonicalize to r in [-pi/4, 3pi/4) with w >= h convention
    if w < h:
        w, h = h, w
        r += np.pi / 2
    while r >= 3 * np.pi / 4:
        r -= np.pi
    while r < -np.pi / 4:
        r += np.pi
    return np.asarray([cx, cy, w, h, r], np.float32)
