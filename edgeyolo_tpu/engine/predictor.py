"""Streaming predictor over images/dirs/videos/arrays.

Behavioral spec: ultralytics/engine/predictor.py:64-330 (generator inference,
letterbox preprocess, per-stage Profile timers, Results emission). The device
program (forward+decode+NMS) jits once per (batch, imgsz) and every frame
reuses it; sources stream on the host.
"""

from __future__ import annotations

import glob
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.data.letterbox import letterbox, load_image_rgb
from edgeyolo_tpu.engine.results import Results
from edgeyolo_tpu.ops.nms import non_max_suppression
from edgeyolo_tpu.utils import LOGGER

IMG_EXTS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}


def _iter_source(source):
    """Yield (path, HWC RGB uint8) frames via the loaders dispatcher
    (images/dirs/globs/arrays/PIL/tensors/frame-iterables; data/loaders.py)."""
    from edgeyolo_tpu.data.loaders import load_inference_source

    loader, _types = load_inference_source(source)
    yield from loader


class DetectionPredictor:
    """Batched streaming inference producing Results objects."""

    def __init__(self, args=None, save_dir: str | Path = "runs/predict"):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "predict"})
        self.save_dir = Path(save_dir)
        self._infer = None

    def _build_infer(self, model, conf, max_nms=8192):
        args = self.args
        nc = model.nc

        @jax.jit
        def infer(v, img):
            out = model.apply(v, img, train=False)
            return non_max_suppression(
                out["pred"], conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms,
                multi_label=False, agnostic=bool(args.agnostic_nms), nc=nc,
            )

        return infer

    def stream(self, model, source, variables=None):
        """Generator over Results (one per frame)."""
        args = self.args
        conf = args.conf if args.conf is not None else 0.25
        imgsz = int(args.imgsz)
        variables = variables if variables is not None else model.variables
        if self._infer is None:
            self._infer = self._build_infer(model, conf)
        names = getattr(model, "names", {})

        want_int8 = bool(getattr(args, "int8", False))
        # per-call int8 semantics (mirror of validator.py): int8=False stashes
        # any active QuantState so this call runs full precision
        if want_int8 and model.quant is None:
            model.quant = getattr(model, "_quant_stash", None)
        elif not want_int8 and model.quant is not None:
            model._quant_stash, model.quant = model.quant, None
        for path, img0 in _iter_source(source):
            t0 = time.perf_counter()
            img, r, (pw, ph) = letterbox(img0, imgsz, scaleup=True)
            x = jnp.asarray(img[None], jnp.float32) / 255.0
            if want_int8 and model.quant is None:
                # PTQ auto-calibration on the first frame (validator calibrates
                # on a full val batch; a single stream frame is the best
                # available representative here)
                model.quantize(x, variables=variables)
                LOGGER.info(f"int8: calibrated {len(model.quant.wq)} convs on first frame")
            t1 = time.perf_counter()
            dets, nvalid = self._infer(variables, x)
            dets = np.asarray(jax.device_get(dets))[0]
            n = int(np.asarray(nvalid)[0])
            t2 = time.perf_counter()
            det = dets[:n].copy()
            if n:
                det[:, [0, 2]] = (det[:, [0, 2]] - pw) / r
                det[:, [1, 3]] = (det[:, [1, 3]] - ph) / r
                h0, w0 = img0.shape[:2]
                det[:, [0, 2]] = det[:, [0, 2]].clip(0, w0)
                det[:, [1, 3]] = det[:, [1, 3]].clip(0, h0)
            res = Results(
                img0, path, names, boxes=det,
                speed={"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3,
                       "postprocess": (time.perf_counter() - t2) * 1e3},
            )
            if args.save or args.save_txt:
                self.save_dir.mkdir(parents=True, exist_ok=True)
                if args.save:
                    res.save(self.save_dir / (Path(path).stem + ".jpg"))
                if args.save_txt:
                    res.save_txt(self.save_dir / "labels" / (Path(path).stem + ".txt"),
                                 save_conf=args.save_conf)
            if args.verbose:
                LOGGER.info(f"{path}: {res.verbose_str} "
                            f"({res.speed['inference']:.1f}ms inference)")
            yield res

    def __call__(self, model, source, variables=None):
        return list(self.stream(model, source, variables))
