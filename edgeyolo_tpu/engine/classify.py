"""Classification validator (top1/top5) and predictor (Probs results).

Behavioral spec: ultralytics/models/yolo/classify/val.py (ClassifyMetrics
top1/top5, utils/metrics.py:1184-1239, fitness = (top1 + top5) / 2) and
classify/predict.py (softmax Probs into Results).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.data.classify import (
    ClassificationDataset,
    ClassifyLoader,
    check_cls_dataset,
    _resize_center_crop,
)
from edgeyolo_tpu.utils import LOGGER, colorstr


class ClassificationValidator:
    """Top-1 / top-5 accuracy over a folder-per-class val split."""

    def __init__(self, args=None, save_dir: str | Path = "runs/val", names: dict | None = None):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "val"})
        self.save_dir = Path(save_dir)
        self.names = names or {}
        self.metrics = None
        self._loader = None
        self._infer = None

    def __call__(self, model, data=None, variables=None, batch_size: int | None = None):
        args = self.args
        data_cfg = data if isinstance(data, dict) else check_cls_dataset(data or args.data)
        names = data_cfg["names"]
        imgsz = int(args.imgsz)
        bs = int(batch_size or args.batch or 16)
        if self._loader is None:
            ds = ClassificationDataset(data_cfg["val"], imgsz=imgsz, augment=False, names=names)
            self._loader = ClassifyLoader(ds, bs, shuffle=False)
        variables = variables if variables is not None else model.variables

        if self._infer is None:
            @jax.jit
            def infer(v, img):
                logits = model.apply(v, img, train=False)
                k = min(5, logits.shape[-1])
                _, topk = jax.lax.top_k(logits, k)
                return topk

            self._infer = infer

        correct1 = correct5 = seen = 0
        t0 = time.time()
        for batch in self._loader:
            img = jnp.asarray(batch["img"], jnp.float32) / 255.0
            topk = np.asarray(self._infer(variables, img))
            labels = batch["cls"]
            for i in range(batch["n_real"]):
                seen += 1
                correct1 += int(topk[i, 0] == labels[i])
                correct5 += int(labels[i] in topk[i])
        top1 = correct1 / max(seen, 1)
        top5 = correct5 / max(seen, 1)
        fitness = (top1 + top5) / 2
        LOGGER.info(f"{colorstr('classify val:')} {seen} images  top1 {top1:.4f}  "
                    f"top5 {top5:.4f}  ({time.time() - t0:.1f}s)")
        self.metrics = {"metrics/accuracy_top1": top1, "metrics/accuracy_top5": top5,
                        "fitness": fitness}
        return self.metrics


class ClassificationPredictor:
    """Streaming classification inference producing Results with Probs."""

    def __init__(self, args=None, save_dir: str | Path = "runs/predict"):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "predict"})
        self.save_dir = Path(save_dir)
        self._infer = None

    def stream(self, model, source, variables=None):
        from edgeyolo_tpu.data.loaders import load_inference_source
        from edgeyolo_tpu.engine.results import Results

        args = self.args
        imgsz = int(args.imgsz)
        variables = variables if variables is not None else model.variables
        names = getattr(model, "names", {})
        if self._infer is None:
            @jax.jit
            def infer(v, img):
                return jax.nn.softmax(model.apply(v, img, train=False), axis=-1)

            self._infer = infer

        bs = max(1, int(getattr(args, "batch", 1) or 1))

        def run_batch(frames):
            # pad the partial final chunk (one compiled shape; padding unread)
            n_real = len(frames)
            imgs = [f[2] for f in frames] + [frames[-1][2]] * (bs - n_real)
            t1 = time.perf_counter()
            probs_b = np.asarray(self._infer(variables,
                                             jnp.asarray(np.stack(imgs), jnp.float32) / 255.0))
            infer_ms = (time.perf_counter() - t1) * 1e3 / n_real
            for i, (path, img0, _img, pre_ms) in enumerate(frames):
                probs = probs_b[i]
                res = Results(img0, path, names, probs=probs,
                              speed={"preprocess": pre_ms,
                                     "inference": infer_ms, "postprocess": 0.0})
                if args.verbose:
                    top = int(probs.argmax())
                    LOGGER.info(f"{path}: {names.get(top, top)} {probs[top]:.3f}")
                yield res

        loader, _types = load_inference_source(source)
        buf = []
        for path, img0 in loader:
            t0 = time.perf_counter()
            img = _resize_center_crop(img0, imgsz)
            buf.append((path, img0, img, (time.perf_counter() - t0) * 1e3))
            if len(buf) == bs:
                yield from run_batch(buf)
                buf = []
        if buf:
            yield from run_batch(buf)

    def __call__(self, model, source, variables=None):
        return list(self.stream(model, source, variables))
