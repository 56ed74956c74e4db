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


def _iter_source(source, vid_stride: int = 1, stream_buffer: bool = False):
    """Yield (path, HWC RGB uint8) frames via the loaders dispatcher
    (images/dirs/globs/arrays/PIL/tensors/frame-iterables; data/loaders.py)."""
    from edgeyolo_tpu.data.loaders import load_inference_source

    loader, _types = load_inference_source(source, vid_stride=vid_stride,
                                           stream_buffer=stream_buffer)
    yield from loader


class DetectionPredictor:
    """Batched streaming inference producing Results objects."""

    def __init__(self, args=None, save_dir: str | Path = "runs/predict"):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "predict"})
        self.save_dir = Path(save_dir)
        self._infer = None
        self._vis_fn = None

    @staticmethod
    def _classes_filter(args):
        """args.classes normalized to a static tuple (reference predictor
        passes args.classes into non_max_suppression, ops.py:254)."""
        c = getattr(args, "classes", None)
        if c is None:
            return None
        if not isinstance(c, (list, tuple)):
            c = [c]
        return tuple(int(x) for x in c) or None

    def _build_infer(self, model, conf, max_nms=8192):
        args = self.args
        nc = model.nc
        cls_filter = self._classes_filter(args)
        if getattr(args, "augment", False):
            if type(self) is DetectionPredictor:
                return self._build_infer_tta(model, conf, max_nms)
            LOGGER.warning("augment=True is detect-only (reference nn/tasks.py:375); "
                           "reverting to single-scale prediction")

        if getattr(model, "end2end", False):
            # NMS-free passthrough: head pred is the score-sorted
            # (B, max_det, 6) xyxy top-k (reference ops.py:224-228)
            @jax.jit
            def infer_e2e(v, img):
                pred = model.apply(v, img, train=False)["pred"]
                keep = pred[..., 4] > conf
                if cls_filter is not None:
                    want = jnp.asarray(list(cls_filter), pred.dtype)
                    keep &= (pred[..., 5:6] == want[None, None]).any(-1)
                k = min(int(args.max_det), pred.shape[1])
                det = jnp.where(keep[..., None], pred, 0.0)[:, :k]
                # cls_filter can punch holes in the score-sorted prefix;
                # compact so nvalid rows are leading (cheap stable sort on ~k)
                order = jnp.argsort(~keep[:, :k], axis=1, stable=True)
                det = jnp.take_along_axis(det, order[..., None], axis=1)
                return det, keep[:, :k].sum(axis=1).astype(jnp.int32)

            return infer_e2e

        @jax.jit
        def infer(v, img):
            out = model.apply(v, img, train=False)
            return non_max_suppression(
                out["pred"], conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms,
                multi_label=False, agnostic=bool(args.agnostic_nms), nc=nc,
                classes=cls_filter,
            )

        return infer

    def _build_infer_tta(self, model, conf, max_nms=8192):
        """Test-time augmentation: 3 scales x (none, lr-flip, none), de-scaled
        and concatenated before one NMS (reference DetectionModel
        _predict_augment/_descale_pred/_clip_augmented, nn/tasks.py:372-409).
        Each scale is its own static shape — XLA compiles 3 sub-programs into
        one jitted call."""
        import math

        args = self.args
        nc = model.nc
        cls_filter = self._classes_filter(args)
        gs = int(max(model.stride))
        nl = len(model.stride)
        g = sum(4**i for i in range(nl))
        scales = (1.0, 0.83, 0.67)
        flips = (None, 3, None)

        @jax.jit
        def infer(v, img):
            B, H, W, C = img.shape
            preds = []
            for si, fi in zip(scales, flips):
                xi = img[:, :, ::-1, :] if fi == 3 else img
                if si != 1.0:
                    nh, nw = int(H * si), int(W * si)
                    xi = jax.image.resize(xi, (B, nh, nw, C), method="bilinear")
                    ph = math.ceil(H * si / gs) * gs
                    pw = math.ceil(W * si / gs) * gs
                    xi = jnp.pad(xi, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                                 constant_values=0.447)  # imagenet-mean pad
                p = model.apply(v, xi, train=False)["pred"]  # (B, A_i, 4+nc)
                box = p[..., :4] / si  # de-scale xywh
                x = (W - box[..., 0:1]) if fi == 3 else box[..., 0:1]  # de-flip lr
                preds.append(jnp.concatenate([x, box[..., 1:4], p[..., 4:]], axis=-1))
            # clip augmented tails: drop the P{nl} anchors of the full-scale
            # pass and the P3 anchors of the smallest-scale pass
            i0 = (preds[0].shape[1] // g) * 1
            preds[0] = preds[0][:, :-i0]
            i2 = (preds[-1].shape[1] // g) * 4 ** (nl - 1)
            preds[-1] = preds[-1][:, i2:]
            pred = jnp.concatenate(preds, axis=1)
            return non_max_suppression(
                pred, conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms,
                multi_label=False, agnostic=bool(args.agnostic_nms), nc=nc,
                classes=cls_filter,
            )

        return infer

    @staticmethod
    def _unletterbox_boxes(det: np.ndarray, r: float, pw: float, ph: float,
                           orig_shape: tuple[int, int]) -> np.ndarray:
        h0, w0 = orig_shape
        det[:, [0, 2]] = ((det[:, [0, 2]] - pw) / r).clip(0, w0)
        det[:, [1, 3]] = ((det[:, [1, 3]] - ph) / r).clip(0, h0)
        return det

    def _to_results(self, outs, i, img0, path, names, r, pads, speed) -> Results:
        """Convert frame i of a batch's device outputs to a Results (task hook)."""
        dets, nvalid = outs
        n = int(np.asarray(nvalid)[i])
        det = np.asarray(dets)[i][:n].copy()
        if n:
            det = self._unletterbox_boxes(det, r, *pads, img0.shape[:2])
        return Results(img0, path, names, boxes=det, speed=speed)

    def stream(self, model, source, variables=None):
        """Generator over Results (one per frame). Frames are letterboxed to
        one static square shape, so args.batch frames ride a single compiled
        forward+NMS call (reference batched LoadImagesAndVideos predict;
        batch=1 keeps frame-by-frame latency)."""
        args = self.args
        conf = args.conf if args.conf is not None else 0.25
        imgsz = int(args.imgsz)
        bs = max(1, int(getattr(args, "batch", 1) or 1))
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

        def run_batch(frames):
            # pad a partial final chunk with the last frame — the program
            # stays one compiled shape; padded outputs are simply not read
            n_real = len(frames)
            imgs = [f[2] for f in frames] + [frames[-1][2]] * (bs - n_real)
            # half=True runs the network in bf16 (reference predictor half arg,
            # engine/predictor.py preprocess half cast): every conv computes in
            # the input dtype (conv.py dtype=x.dtype) while the head's decode
            # stays an f32 island (head.py flat.astype(float32)), so box
            # precision is unaffected. On a byte-bound nano model this halves
            # HBM traffic (PERF.md §bf16).
            dt = jnp.bfloat16 if bool(getattr(args, "half", False)) else jnp.float32
            x = jnp.asarray(np.stack(imgs), dt) / 255.0
            if want_int8 and model.quant is None:
                # PTQ auto-calibration on the first chunk (validator
                # calibrates on a full val batch; the first frames are the
                # best available representative here)
                model.quantize(x, variables=variables)
                LOGGER.info(f"int8: calibrated {len(model.quant.wq)} convs on first batch")
            t1 = time.perf_counter()
            outs = self._infer(variables, x)
            outs = jax.tree.map(np.asarray, jax.device_get(outs))
            infer_ms = (time.perf_counter() - t1) * 1e3 / n_real
            for i, (path, img0, _img, r, pads, pre_ms) in enumerate(frames):
                if getattr(args, "visualize", False):
                    self._visualize(model, variables, x[i : i + 1], Path(path).stem)
                t2 = time.perf_counter()
                speed = {"preprocess": pre_ms, "inference": infer_ms, "postprocess": 0.0}
                res = self._to_results(outs, i, img0, path, names, r, pads, speed)
                res.speed["postprocess"] = (time.perf_counter() - t2) * 1e3
                if args.save or args.save_txt:
                    self.save_dir.mkdir(parents=True, exist_ok=True)
                    if args.save:
                        res.save(self.save_dir / (Path(path).stem + ".jpg"),
                                 line_width=getattr(args, "line_width", None),
                                 labels=bool(getattr(args, "show_labels", True)),
                                 conf=bool(getattr(args, "show_conf", True)))
                    if args.save_txt:
                        res.save_txt(self.save_dir / "labels" / (Path(path).stem + ".txt"),
                                     save_conf=args.save_conf)
                if args.verbose:
                    LOGGER.info(f"{path}: {res.verbose_str} "
                                f"({res.speed['inference']:.1f}ms inference)")
                yield res

        buf = []
        for path, img0 in _iter_source(source, vid_stride=int(getattr(args, 'vid_stride', 1) or 1),
                                       stream_buffer=bool(getattr(args, 'stream_buffer', False))):
            t0 = time.perf_counter()
            img, r, (pw, ph) = letterbox(img0, imgsz, scaleup=True)
            buf.append((path, img0, img, r, (pw, ph), (time.perf_counter() - t0) * 1e3))
            if len(buf) == bs:
                yield from run_batch(buf)
                buf = []
        if buf:
            yield from run_batch(buf)

    def _visualize(self, model, variables, x, stem: str):
        """Save per-layer feature-map grids (reference predict visualize=True
        -> feature_visualization per non-head layer, nn/tasks.py:173). Runs a
        second capture forward — visualize is a debug mode, not a hot path."""
        from edgeyolo_tpu.utils.plotting import feature_visualization

        if self._vis_fn is None:
            idxs = tuple(sp.i for sp in model.spec[:-1])  # head excluded

            @jax.jit
            def vis(v, img):
                return model.apply(v, img, train=False, capture=idxs)[1]

            self._vis_fn = vis
        feats = jax.device_get(self._vis_fn(variables, x))
        out_dir = self.save_dir / stem
        for sp in model.spec[:-1]:
            f = feats.get(sp.i)
            if f is not None and hasattr(f, "ndim"):  # skip list outputs (CBLinear)
                feature_visualization(f, sp.name, sp.i, out_dir)
        LOGGER.info(f"saved feature maps to {out_dir}")

    def __call__(self, model, source, variables=None):
        return list(self.stream(model, source, variables))


class SegmentationPredictor(DetectionPredictor):
    """Detection + instance masks (reference models/yolo/segment/predict.py:
    process_mask at proto resolution, crop to boxes, scale_masks to the
    original frame)."""

    def _build_infer(self, model, conf, max_nms=8192):
        from edgeyolo_tpu.ops import boxes as box_ops

        args = self.args
        nc = model.nc
        cls_filter = self._classes_filter(args)

        @jax.jit
        def infer(v, img):
            out = model.apply(v, img, train=False)
            pred = out["pred"]  # (B, A, 4+nc+nm)
            det, n, aidx = non_max_suppression(
                pred[..., : 4 + nc], conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms,
                multi_label=False, agnostic=bool(args.agnostic_nms), nc=nc,
                return_idx=True, classes=cls_filter,
            )
            coefs = jnp.take_along_axis(pred[..., 4 + nc :], aidx[..., None], axis=1)
            masks = jax.nn.sigmoid(jnp.einsum("bhwn,bdn->bdhw", out["proto"], coefs))
            scale = masks.shape[2] / img.shape[1]  # proto stride factor (1/4)
            masks = jax.vmap(box_ops.crop_mask)(masks, det[..., :4] * scale)
            return det, n, masks

        return infer

    def _to_results(self, outs, i, img0, path, names, r, pads, speed) -> Results:
        from edgeyolo_tpu.ops.segments import unletterbox_masks

        dets, nvalid, masks = outs
        n = int(np.asarray(nvalid)[i])
        det = np.asarray(dets)[i][:n].copy()
        res_masks = None
        if n:
            pw, ph = pads
            det = self._unletterbox_boxes(det, r, pw, ph, img0.shape[:2])
            pm = np.asarray(masks)[i][:n]  # (n, ph, pw) proto-res [0,1]
            s = pm.shape[1] / (img0.shape[0] * r + 2 * ph)  # proto/input scale
            res_masks = unletterbox_masks(pm, (pw * s, ph * s), img0.shape[:2]) > 0.5
        return Results(img0, path, names, boxes=det, masks=res_masks, speed=speed)


class PosePredictor(DetectionPredictor):
    """Detection + keypoints (reference models/yolo/pose/predict.py — the head
    appends decoded input-space keypoints to pred; gather by kept anchor)."""

    def __init__(self, args=None, save_dir: str | Path = "runs/predict", kpt_shape=(17, 3)):
        super().__init__(args, save_dir)
        self.kpt_shape = tuple(kpt_shape)

    def stream(self, model, source, variables=None):
        ks = model.yaml.get("kpt_shape") if hasattr(model, "yaml") else None
        if ks:
            self.kpt_shape = tuple(ks)
        yield from super().stream(model, source, variables)

    def _build_infer(self, model, conf, max_nms=8192):
        args = self.args
        nc = model.nc
        cls_filter = self._classes_filter(args)

        @jax.jit
        def infer(v, img):
            out = model.apply(v, img, train=False)
            pred = out["pred"]  # (B, A, 4+nc+K*D) decoded kpts appended
            det, n, aidx = non_max_suppression(
                pred[..., : 4 + nc], conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms,
                multi_label=False, agnostic=bool(args.agnostic_nms), nc=nc,
                return_idx=True, classes=cls_filter,
            )
            kpts = jnp.take_along_axis(pred[..., 4 + nc :], aidx[..., None], axis=1)
            return det, n, kpts

        return infer

    def _to_results(self, outs, i, img0, path, names, r, pads, speed) -> Results:
        dets, nvalid, kpts = outs
        n = int(np.asarray(nvalid)[i])
        det = np.asarray(dets)[i][:n].copy()
        res_kpts = None
        if n:
            pw, ph = pads
            det = self._unletterbox_boxes(det, r, pw, ph, img0.shape[:2])
            K, D = self.kpt_shape
            pk = np.asarray(kpts)[i][:n].reshape(n, K, D).copy()
            pk[..., 0] = (pk[..., 0] - pw) / r
            pk[..., 1] = (pk[..., 1] - ph) / r
            res_kpts = pk
        return Results(img0, path, names, boxes=det, keypoints=res_kpts, speed=speed)


class OBBPredictor(DetectionPredictor):
    """Rotated-box prediction via probiou NMS (reference models/yolo/obb/
    predict.py). Results carry .obb instead of .boxes."""

    def _build_infer(self, model, conf, max_nms=8192):
        from edgeyolo_tpu.ops.nms import nms_rotated

        args = self.args
        cls_filter = self._classes_filter(args)

        @jax.jit
        def infer(v, img):
            out = model.apply(v, img, train=False)
            det, n = nms_rotated(
                out["pred"], conf_thres=conf, iou_thres=float(args.iou),
                max_det=int(args.max_det), max_nms=max_nms, classes=cls_filter,
            )
            return det, n

        return infer

    def _to_results(self, outs, i, img0, path, names, r, pads, speed) -> Results:
        dets, nvalid = outs
        n = int(np.asarray(nvalid)[i])
        det = np.asarray(dets)[i][:n].copy()  # (n, 7) cx,cy,w,h,angle,conf,cls
        if n:
            pw, ph = pads
            det[:, 0] = (det[:, 0] - pw) / r
            det[:, 1] = (det[:, 1] - ph) / r
            det[:, 2:4] = det[:, 2:4] / r
        return Results(img0, path, names, obb=det, speed=speed)
