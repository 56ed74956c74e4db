"""Detection validator: batched device inference + NMS, host TP matching,
101-pt mAP with the fork's mAP75 column.

Behavioral spec: ultralytics/engine/validator.py:107-262 and
models/yolo/detect/val.py (NMS conf=0.001 iou=0.7 multi_label, scale to native
space, 10-threshold TP matrix). TPU design: forward+decode+NMS jit once at a
static batch shape; only the <=300 rows per image cross back to host.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.data.dataset import YOLODataset, check_det_dataset, build_dataloader
from edgeyolo_tpu.metrics.metrics import (
    ConfusionMatrix,
    DetMetrics,
    _box_iou_np,
    match_predictions,
    match_predictions_device,
)
from edgeyolo_tpu.ops import boxes as box_ops
from edgeyolo_tpu.ops.nms import nms_rotated, non_max_suppression
from edgeyolo_tpu.parallel.mesh import batch_sharding, get_mesh, replicated
from edgeyolo_tpu.utils import LOGGER, colorstr


class DetectionValidator:
    """Runs the eval loop and computes detection metrics."""

    def __init__(self, args=None, save_dir: str | Path = "runs/val", names: dict | None = None,
                 max_devices: int | None = None):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "val"})
        self.save_dir = Path(save_dir)
        self.names = names or {}
        self.metrics = None
        self.jdict = []
        self.class_map = None  # set per-call: contiguous idx -> json category_id
        self._loader = None  # cached across calls (epoch revalidation)
        self._infer = None
        self.max_devices = max_devices  # None = all devices that divide bs
        self._mesh = None

    def _setup_mesh(self, bs: int):
        """Data-parallel eval mesh (SURVEY §2.9): shard val batches over the
        largest device count dividing the batch; single-device when that's 1.
        The reference serializes epoch-val on rank 0 (validator.py:107-206);
        here the whole eval program — forward, NMS, native-space scaling and
        TP matching — runs SPMD over the mesh and only per-image TP/conf/cls
        rows cross to the host for the final 101-pt interpolation."""
        n_avail = min(len(jax.devices()), self.max_devices or len(jax.devices()))
        dev_arg = getattr(self.args, "device", None)
        if self.max_devices is None and dev_arg is not None \
                and str(dev_arg).isdigit() and int(dev_arg) > 0:
            n_avail = min(n_avail, int(dev_arg))
        n_dev = max(n for n in range(1, n_avail + 1) if bs % n == 0)
        if self._mesh is None or self._mesh.devices.size != n_dev:
            self._mesh = get_mesh(n_dev)
        return self._mesh

    def _shard(self, *arrays):
        sh = batch_sharding(self._mesh)
        return tuple(jax.device_put(a, sh) for a in arrays)

    def __call__(self, model, data=None, variables=None, batch_size: int | None = None,
                 max_nms: int = 30000):
        """model: nn.tasks.BaseModel handle (holds flax net + variables)."""
        args = self.args
        conf = args.conf if args.conf is not None else 0.001
        data_cfg = check_det_dataset(data or args.data)
        names = data_cfg["names"]
        imgsz = int(args.imgsz)
        bs = int(batch_size or args.batch or 16)

        split = data_cfg.get(args.split or "val") or data_cfg["val"]
        # COCO GT jsons use the sparse 1-90 category ids; predictions.json must
        # speak that dialect (reference pred_to_json class_map, detect/val.py)
        if bool(getattr(args, "save_json", False)) and len(names) == 80 \
                and "coco" in str(split).lower():
            from edgeyolo_tpu.data.converter import coco80_to_coco91_class

            self.class_map = coco80_to_coco91_class()
        if self._loader is None:
            dataset = YOLODataset(split, imgsz=imgsz, augment=False, names=names,
                                  single_cls=bool(getattr(args, "single_cls", False)))
            if bool(getattr(args, "rect", False)):
                # aspect-sorted per-batch canvas shapes, quantized to /64 so at
                # most a handful of XLA programs compile (dataset.set_rectangle)
                dataset.set_rectangle(bs)
            self._loader = build_dataloader(dataset, bs, shuffle=False)
        loader = self._loader

        variables = variables if variables is not None else model.variables
        nc = model.nc

        # int8 val mode: auto-calibrate on the first val batch (PTQ absmax —
        # reference analog: representative-dataset int8, exporter.py:1055).
        # The per-call flag is authoritative: int8=False stashes any active
        # QuantState so this call runs full precision (and a later int8=True
        # reuses the stashed calibration) — a prior int8 call must not
        # silently contaminate subsequent full-precision calls on the handle.
        if bool(getattr(args, "int8", False)):
            if model.quant is None:
                model.quant = getattr(model, "_quant_stash", None)
            if model.quant is None:
                first = loader.first_batch()
                calib = jnp.asarray(first["img"], jnp.float32) / 255.0
                model.quantize(calib, variables=variables)
                LOGGER.info(f"{colorstr('int8:')} calibrated {len(model.quant.wq)} convs "
                            f"on one val batch ({calib.shape[0]} imgs)")
        elif getattr(model, "quant", None) is not None:
            # model may be a backend adapter with no quant attribute at all
            model._quant_stash, model.quant = model.quant, None

        mesh = self._setup_mesh(bs)
        variables = jax.device_put(variables, replicated(mesh))

        if self._infer is None:
            is_detr = getattr(model, "head_name", "") == "RTDETRDecoder"
            is_e2e = bool(getattr(model, "end2end", False))
            # backend adapters (onnx executor / tf interpreters via
            # utils/benchmarks._BackendAdapter) consume concrete arrays — the
            # network runs eagerly and only the post (NMS + native-space
            # scale + TP matching) is jitted
            eager_net = bool(getattr(model, "eager_only", False))

            def infer_body(v, img, gtb, gtc, gtv, geom, pred=None):
                if pred is None:
                    pred = model.apply(v, img, train=False)["pred"]
                if is_detr:
                    # query-based: no NMS; scale normalized cxcywh to pixels,
                    # take per-query argmax class (reference RTDETRValidator)
                    s = jnp.asarray([img.shape[2], img.shape[1]] * 2, jnp.float32)
                    from edgeyolo_tpu.ops.boxes import xywh2xyxy as _x

                    boxes = _x(pred[..., :4] * s)
                    scores = pred[..., 4:]
                    best = jnp.max(scores, axis=-1)
                    cls_ix = jnp.argmax(scores, axis=-1).astype(jnp.float32)
                    k = min(int(args.max_det), boxes.shape[1])
                    top, ix = jax.lax.top_k(best, k)
                    det = jnp.concatenate([
                        jnp.take_along_axis(boxes, ix[..., None], axis=1),
                        top[..., None],
                        jnp.take_along_axis(cls_ix, ix, axis=1)[..., None],
                    ], axis=-1)
                    det = jnp.where((top > conf)[..., None], det, 0.0)
                    nvalid = (top > conf).sum(axis=1).astype(jnp.int32)
                elif is_e2e:
                    # NMS-free passthrough: the head already returns the
                    # score-sorted (B, max_det, 6) xyxy selection (reference
                    # ops.py:224-228 `pred[pred[:, 4] > conf_thres]`)
                    keep = pred[..., 4] > conf
                    k = min(int(args.max_det), pred.shape[1])
                    det = jnp.where(keep[..., None], pred, 0.0)[:, :k]
                    nvalid = keep[:, :k].sum(axis=1).astype(jnp.int32)
                else:
                    det, nvalid = non_max_suppression(
                        pred, conf_thres=conf, iou_thres=float(args.iou),
                        max_det=int(args.max_det), max_nms=max_nms, multi_label=True,
                        agnostic=bool(args.single_cls), nc=nc,
                    )
                # ---- on-device native-space scaling + TP matching ----------
                # (SURVEY §2.9 "eval-metric accumulation on device"): undo the
                # letterbox, clip to native bounds, greedy-match vs gt; only
                # (det, n, tp) rows cross back to the host
                r, pw, ph, w0, h0 = (geom[:, i] for i in range(5))
                shift = jnp.stack([pw, ph, pw, ph], -1)[:, None, :]
                lim = jnp.stack([w0, h0, w0, h0], -1)[:, None, :]
                bx = jnp.clip((det[..., :4] - shift) / r[:, None, None], 0.0, lim)
                D = det.shape[1]
                dvalid = jnp.arange(D)[None, :] < nvalid[:, None]
                iou = jax.vmap(box_ops.box_iou)(gtb, bx)  # (B, Mp, D)
                tp = jax.vmap(match_predictions_device)(
                    det[..., 5], gtc, gtv > 0, dvalid, iou)
                return det, nvalid, tp

            if eager_net:
                post = jax.jit(lambda pred, img, gtb, gtc, gtv, geom:
                               infer_body(None, img, gtb, gtc, gtv, geom, pred=pred))

                def infer(v, img, gtb, gtc, gtv, geom):
                    import numpy as _np
                    pred = jnp.asarray(model.apply(
                        v, _np.asarray(img, _np.float32), train=False)["pred"],
                        jnp.float32)
                    return post(pred, img, gtb, gtc, gtv, geom)
            else:
                infer = jax.jit(infer_body)

            self._infer = infer
        infer = self._infer

        metrics = DetMetrics(names)
        confusion = ConfusionMatrix(nc=len(names))
        seen = 0
        t_pre = t_inf = t_post = 0.0
        LOGGER.info(f"{colorstr('validating:')} {split} imgsz={imgsz} bs={bs} conf={conf} "
                    f"devices={mesh.devices.size}")

        # half=True: bf16 network compute (conv.py dtype=x.dtype), f32 decode
        # island in the head — same contract as the predictor's half arg
        in_dt = jnp.bfloat16 if bool(getattr(self.args, "half", False)) else jnp.float32
        for batch in loader:
            t0 = time.perf_counter()
            img = jnp.asarray(batch["img"], in_dt) / 255.0
            gtb_h, gtc_h, gtv_h, geom_h = self._gt_arrays(batch)
            img, gtb, gtc, gtv, geom = self._shard(img, gtb_h, gtc_h, gtv_h, geom_h)
            t1 = time.perf_counter()
            dets, nvalid, tp_b = infer(variables, img, gtb, gtc, gtv, geom)
            dets = np.asarray(jax.device_get(dets))
            nvalid = np.asarray(nvalid)
            tp_b = np.asarray(tp_b)
            t2 = time.perf_counter()

            for i in range(batch["n_real"]):
                meta = batch["meta"][i]
                seen += 1
                n = int(nvalid[i])
                det = dets[i, :n]  # (n,6) xyxy in letterbox space
                gt_cls = meta["ori_cls"]
                metrics.update_batch(tp_b[i, :n], det[:, 4], det[:, 5], gt_cls)
                if args.plots or args.save_json:
                    h0, w0 = meta["ori_shape"]
                    r, (pw, ph) = meta["ratio_pad"]
                    det = det.copy()
                    det[:, [0, 2]] = ((det[:, [0, 2]] - pw) / r).clip(0, w0)
                    det[:, [1, 3]] = ((det[:, [1, 3]] - ph) / r).clip(0, h0)
                if args.plots:
                    gtb_i = np.asarray(gtb_h[i, : len(gt_cls)])
                    confusion.process_batch(det if n else None, gtb_i, gt_cls)
                if args.save_json:
                    self._to_json(det, meta["im_file"])
            t_pre += t1 - t0
            t_inf += t2 - t1
            t_post += time.perf_counter() - t2

        metrics.process()
        metrics.speed = {
            "preprocess": t_pre / max(seen, 1) * 1000,
            "inference": t_inf / max(seen, 1) * 1000,
            "postprocess": t_post / max(seen, 1) * 1000,
            "loss": 0.0,
        }
        self.metrics = metrics
        self.confusion = confusion
        mp, mr, map50, map_ = metrics.mean_results()
        # fork behavior: extra mAP75 column in the report (detect/val.py:90)
        LOGGER.info(f"{'all':>10}{seen:>8}{mp:>11.3g}{mr:>11.3g}{map50:>11.3g}{metrics.box.map75:>11.3g}{map_:>11.3g}")
        if args.save_json and self.jdict:
            import json

            self.save_dir.mkdir(parents=True, exist_ok=True)
            pred_path = self.save_dir / "predictions.json"
            pred_path.write_text(json.dumps(self.jdict))
            gt_json = data_cfg.get("annotations") or data_cfg.get("gt_json")
            if gt_json and Path(gt_json).exists():
                from edgeyolo_tpu.metrics.coco_eval import evaluate_coco

                coco = evaluate_coco(gt_json, pred_path)
                for k, v in coco.items():
                    metrics.speed[f"coco/{k}"] = v  # surfaced alongside results
        return metrics.results_dict

    @staticmethod
    def _gt_arrays(batch):
        """Pad per-image native-space gt (from metas) into fixed arrays for
        the on-device matcher. Mp rounds up to 32 so at most a handful of
        XLA programs compile across batches; padded class slots are -1 so
        they never class-match."""
        metas = batch["meta"]
        B = len(metas)
        mx = max((len(m["ori_cls"]) for m in metas), default=0)
        Mp = max(32, ((mx + 31) // 32) * 32)
        gtb = np.zeros((B, Mp, 4), np.float32)
        gtc = np.full((B, Mp), -1.0, np.float32)
        gtv = np.zeros((B, Mp), np.float32)
        geom = np.zeros((B, 5), np.float32)
        for i, m in enumerate(metas):
            h0, w0 = m["ori_shape"]
            r, (pw, ph) = m["ratio_pad"]
            geom[i] = (r, pw, ph, w0, h0)
            cls = m["ori_cls"]
            n = len(cls)
            if n:
                b = m["ori_bboxes"] * np.array([w0, h0, w0, h0], np.float32)
                gtb[i, :n] = np.concatenate(
                    [b[:, :2] - b[:, 2:] / 2, b[:, :2] + b[:, 2:] / 2], 1)
                gtc[i, :n] = cls
                gtv[i, :n] = 1.0
        return gtb, gtc, gtv, geom

    def _to_json(self, det: np.ndarray, im_file: str):
        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        cmap = self.class_map
        box = det[:, :4].copy()
        box[:, 2:] -= box[:, :2]  # xywh (top-left)
        for b, d in zip(box.tolist(), det.tolist()):
            ci = int(d[5])
            self.jdict.append({
                "image_id": image_id,
                "category_id": cmap[ci] if cmap else ci,
                "bbox": [round(x, 3) for x in b],
                "score": round(d[4], 5),
            })


class SegmentationValidator(DetectionValidator):
    """Adds mask-IoU TP matching (reference models/yolo/segment/val.py:71-291).

    Reports box metrics from the shared path plus a mask mAP table. Mask IoU
    is computed ON DEVICE at native (input) resolution by default: both the
    prototype masks and the stored-ratio gt masks are bilinearly upsampled to
    imgsz before thresholding and intersection counting (reference
    utils/ops.py:663-738 process_mask upsample + segment/val.py gt
    interpolate), and only the (gt, det) IoU matrix crosses to the host.
    `mask_iou_res="proto"` keeps the round-2 proto-resolution comparison.
    """

    def __init__(self, *a, mask_iou_res: str = "native", **kw):
        super().__init__(*a, **kw)
        self.mask_iou_res = mask_iou_res

    def __call__(self, model, data=None, variables=None, batch_size=None, max_nms=30000):
        args = self.args
        conf = args.conf if args.conf is not None else 0.001
        data_cfg = check_det_dataset(data or args.data)
        names = data_cfg["names"]
        imgsz = int(args.imgsz)
        bs = int(batch_size or args.batch or 16)
        split = data_cfg.get(args.split or "val") or data_cfg["val"]
        if self._loader is None:
            ds = YOLODataset(split, imgsz=imgsz, augment=False, names=names, task="segment",
                             single_cls=bool(getattr(args, "single_cls", False)),
                             mask_ratio=4)
            self._loader = build_dataloader(ds, bs, shuffle=False)
        loader = self._loader
        variables = variables if variables is not None else model.variables
        nc = model.nc
        native = self.mask_iou_res == "native"

        if self._infer is None:
            @jax.jit
            def infer(v, img, gt_masks):
                out = model.apply(v, img, train=False)
                pred = out["pred"]  # (B, A, 4+nc+nm)
                det, n, aidx = non_max_suppression(
                    pred[..., : 4 + nc], conf_thres=conf, iou_thres=float(args.iou),
                    max_det=int(args.max_det), max_nms=max_nms, multi_label=True, nc=nc,
                    return_idx=True,
                )
                coefs = jnp.take_along_axis(pred[..., 4 + nc :], aidx[..., None], axis=1)
                # (B, max_det, ph, pw) sigmoid proto masks, cropped to the
                # detection boxes at proto resolution (reference process_mask
                # applies crop_mask before thresholding — without it mask
                # pixels leak outside boxes and mask IoU is understated)
                masks = jax.nn.sigmoid(jnp.einsum("bhwn,bdn->bdhw", out["proto"], coefs))
                scale = masks.shape[2] / img.shape[1]
                masks = jax.vmap(box_ops.crop_mask)(masks, det[..., :4] * scale)
                S = img.shape[1]
                D = masks.shape[1]
                G = gt_masks.shape[1]

                overlap = bool(getattr(args, "overlap_mask", True))

                def per_image(mm):
                    pm, gm = mm
                    if overlap:
                        # reference overlap_mask=True semantics: gt instances
                        # are EXCLUSIVE — an overlapped pixel belongs to the
                        # smallest-area instance (polygons2masks_overlap
                        # draws area-descending and clips, data/utils.py:257;
                        # val re-extracts per-instance masks from that index
                        # map, segment/val.py _process_batch overlap=True)
                        areas = gm.sum((1, 2))
                        a = jnp.where(gm > 0.5, areas[:, None, None], jnp.inf)
                        gm = gm * (a <= a.min(axis=0, keepdims=True))
                    if native:  # upsample gt to input res (bilinear + 0.5:
                        # reference gt F.interpolate "bilinear" + gt_(0.5),
                        # segment/val.py _process_batch; pred upsample below)
                        gm = jax.image.resize(gm, (G, S, S), "bilinear")
                    gmb = (gm > 0.5).astype(jnp.float32)
                    # chunk the prediction slots: upsampling all max_det
                    # (default 300) masks to (D, S, S) at once is a ~0.5 GB
                    # fp32 temp; 64-slot chunks bound it at ~100 MB with
                    # identical results (resize is per-mask independent)
                    C = min(D, 64)
                    nch = -(-D // C)
                    pmc = jnp.pad(pm, ((0, nch * C - D), (0, 0), (0, 0)))
                    pmc = pmc.reshape(nch, C, pm.shape[1], pm.shape[2])

                    def chunk(pc):
                        if native:  # reference process_mask upsample ops.py:695
                            pc = jax.image.resize(pc, (C, S, S), "bilinear")
                        pcb = (pc > 0.5).astype(jnp.float32)
                        return jnp.einsum("ghw,dhw->gd", gmb, pcb), pcb.sum((1, 2))

                    inter_c, psum_c = jax.lax.map(chunk, pmc)
                    inter = inter_c.transpose(1, 0, 2).reshape(G, nch * C)[:, :D]
                    psum = psum_c.reshape(nch * C)[:D]
                    union = gmb.sum((1, 2))[:, None] + psum[None, :] - inter
                    return inter / (union + 1e-7)

                # sequential over the batch: bounds the (D,S,S) upsample temp
                iou_mask = jax.lax.map(per_image, (masks, gt_masks.astype(jnp.float32)))
                return det, n, iou_mask

            self._infer = infer

        box_m = DetMetrics(names)
        mask_m = DetMetrics(names)
        seen = 0
        for batch in loader:
            img = jnp.asarray(batch["img"], jnp.float32) / 255.0
            gtm = jnp.asarray(batch["masks"]) if "masks" in batch else jnp.zeros(
                (img.shape[0], batch["cls"].shape[1], img.shape[1] // 4, img.shape[2] // 4),
                jnp.float32)
            det_b, n_b, iou_b = self._infer(variables, img, gtm)
            det_b = np.asarray(det_b)
            n_b = np.asarray(n_b)
            iou_b = np.asarray(iou_b)
            for i in range(batch["n_real"]):
                meta = batch["meta"][i]
                seen += 1
                n = int(n_b[i])
                det = det_b[i, :n].copy()
                h0, w0 = meta["ori_shape"]
                r, (pw, ph) = meta["ratio_pad"]
                if n:
                    det[:, [0, 2]] = (det[:, [0, 2]] - pw) / r
                    det[:, [1, 3]] = (det[:, [1, 3]] - ph) / r
                gt_cls = meta["ori_cls"]
                gtb = meta["ori_bboxes"].copy()
                if len(gtb):
                    gtb = gtb * np.array([w0, h0, w0, h0], np.float32)
                    gtb = np.concatenate([gtb[:, :2] - gtb[:, 2:] / 2, gtb[:, :2] + gtb[:, 2:] / 2], 1)
                iou_box = _box_iou_np(gtb, det[:, :4]) if (n and len(gtb)) else np.zeros((len(gtb), n))
                box_m.update_batch(match_predictions(det[:, 5], gt_cls, iou_box), det[:, 4], det[:, 5], gt_cls)
                ngt = int(meta["mask_gt"].sum())
                if "masks" in batch and ngt:
                    iou_mask = iou_b[i, :ngt, :n]
                    mask_m.update_batch(match_predictions(det[:, 5], gt_cls[:ngt], iou_mask),
                                        det[:, 4], det[:, 5], gt_cls[:ngt])
        box_m.process()
        mask_m.process()
        self.metrics = box_m
        res = box_m.results_dict
        res.update({
            "metrics/mAP50(M)": mask_m.box.map50,
            "metrics/mAP50-95(M)": mask_m.box.map,
        })
        LOGGER.info(f"seg val: box mAP50-95 {box_m.box.map:.4f}  mask mAP50-95 {mask_m.box.map:.4f}")
        return res


class PoseValidator(DetectionValidator):
    """Adds OKS-based keypoint TP matching (reference models/yolo/pose/val.py:159)."""

    def __call__(self, model, data=None, variables=None, batch_size=None, max_nms=30000):

        args = self.args
        conf = args.conf if args.conf is not None else 0.001
        data_cfg = check_det_dataset(data or args.data)
        names = data_cfg["names"]
        imgsz = int(args.imgsz)
        bs = int(batch_size or args.batch or 16)
        split = data_cfg.get(args.split or "val") or data_cfg["val"]
        K, D = tuple(model.yaml.get("kpt_shape", (17, 3)))
        if self._loader is None:
            ds = YOLODataset(split, imgsz=imgsz, augment=False, names=names, task="pose",
                             single_cls=bool(getattr(args, "single_cls", False)),
                             kpt_shape=(K, D))
            self._loader = build_dataloader(ds, bs, shuffle=False)
        loader = self._loader
        variables = variables if variables is not None else model.variables
        nc = model.nc

        if self._infer is None:
            @jax.jit
            def infer(v, img):
                out = model.apply(v, img, train=False)
                pred = out["pred"]  # (B, A, 4+nc+K*D) decoded kpts appended
                det, n, aidx = non_max_suppression(
                    pred[..., : 4 + nc], conf_thres=conf, iou_thres=float(args.iou),
                    max_det=int(args.max_det), max_nms=max_nms, multi_label=True, nc=nc,
                    return_idx=True,
                )
                kpts = jnp.take_along_axis(pred[..., 4 + nc :], aidx[..., None], axis=1)
                return det, n, kpts

            self._infer = infer

        box_m = DetMetrics(names)
        pose_m = DetMetrics(names)
        sigmas = (np.array([.26,.25,.25,.35,.35,.79,.79,.72,.72,.62,.62,1.07,1.07,.87,.87,.89,.89]) / 10.0
                  if K == 17 else np.full(K, 1.0 / K))
        seen = 0
        for batch in loader:
            img = jnp.asarray(batch["img"], jnp.float32) / 255.0
            det_b, n_b, kpts_b = self._infer(variables, img)
            det_b, n_b, kpts_b = np.asarray(det_b), np.asarray(n_b), np.asarray(kpts_b)
            for i in range(batch["n_real"]):
                meta = batch["meta"][i]
                seen += 1
                n = int(n_b[i])
                det = det_b[i, :n].copy()
                h0, w0 = meta["ori_shape"]
                r, (pw, ph) = meta["ratio_pad"]
                pk = kpts_b[i, :n].reshape(n, K, D).copy()
                if n:
                    det[:, [0, 2]] = (det[:, [0, 2]] - pw) / r
                    det[:, [1, 3]] = (det[:, [1, 3]] - ph) / r
                    pk[..., 0] = (pk[..., 0] - pw) / r
                    pk[..., 1] = (pk[..., 1] - ph) / r
                gt_cls = meta["ori_cls"]
                gtb = meta["ori_bboxes"].copy()
                if len(gtb):
                    gtb = gtb * np.array([w0, h0, w0, h0], np.float32)
                    gtb = np.concatenate([gtb[:, :2] - gtb[:, 2:] / 2, gtb[:, :2] + gtb[:, 2:] / 2], 1)
                iou_box = _box_iou_np(gtb, det[:, :4]) if (n and len(gtb)) else np.zeros((len(gtb), n))
                box_m.update_batch(match_predictions(det[:, 5], gt_cls, iou_box), det[:, 4], det[:, 5], gt_cls)
                # OKS vs gt keypoints (letterbox -> original space)
                ngt = int(meta["mask_gt"].sum())
                gk = meta.get("keypoints")
                if gk is not None and ngt and n:
                    gk = gk[:ngt].copy()
                    gk[..., 0] = (gk[..., 0] - pw) / r
                    gk[..., 1] = (gk[..., 1] - ph) / r
                    area = (gtb[:ngt, 2] - gtb[:ngt, 0]) * (gtb[:ngt, 3] - gtb[:ngt, 1]) * 0.53
                    d2 = ((gk[:, None, :, 0] - pk[None, :, :, 0]) ** 2
                          + (gk[:, None, :, 1] - pk[None, :, :, 1]) ** 2)
                    vis = gk[..., 2] > 0
                    e = d2 / (2 * sigmas[None, None]) ** 2 / (area[:, None, None] + 1e-7) / 2
                    oks = (np.exp(-e) * vis[:, None]).sum(-1) / (vis.sum(-1)[:, None] + 1e-7)
                    pose_m.update_batch(match_predictions(det[:, 5], gt_cls[:ngt], oks),
                                        det[:, 4], det[:, 5], gt_cls[:ngt])
        box_m.process()
        pose_m.process()
        self.metrics = box_m
        res = box_m.results_dict
        res.update({"metrics/mAP50(P)": pose_m.box.map50, "metrics/mAP50-95(P)": pose_m.box.map})
        LOGGER.info(f"pose val: box mAP50-95 {box_m.box.map:.4f}  pose mAP50-95 {pose_m.box.map:.4f}")
        return res


class OBBValidator(DetectionValidator):
    """Rotated-box TP matching via probiou (reference models/yolo/obb/val.py:39-147)."""

    def __call__(self, model, data=None, variables=None, batch_size=None, max_nms=30000):
        from edgeyolo_tpu.ops.boxes import probiou

        args = self.args
        conf = args.conf if args.conf is not None else 0.001
        data_cfg = check_det_dataset(data or args.data)
        names = data_cfg["names"]
        imgsz = int(args.imgsz)
        bs = int(batch_size or args.batch or 16)
        split = data_cfg.get(args.split or "val") or data_cfg["val"]
        if self._loader is None:
            ds = YOLODataset(split, imgsz=imgsz, augment=False, names=names, task="obb",
                             single_cls=bool(getattr(args, "single_cls", False)))
            self._loader = build_dataloader(ds, bs, shuffle=False)
        loader = self._loader
        variables = variables if variables is not None else model.variables
        nc = model.nc

        if self._infer is None:
            @jax.jit
            def infer(v, img):
                out = model.apply(v, img, train=False)
                pred = out["pred"]  # (B, A, 4+nc+1) xywh(r-center) + cls + angle
                # rotated probiou suppression, matching the reference OBB
                # postprocess (ops.py:146-165 via rotated=True) — axis-aligned
                # NMS over rotated extents under/over-suppresses oriented boxes
                det, n = nms_rotated(
                    pred, conf_thres=conf, iou_thres=float(args.iou),
                    max_det=int(args.max_det), max_nms=max_nms,
                    multi_label=True,  # reference val setting (obb/val.py:53)
                )
                return det, n

            self._infer = infer

        obb_m = DetMetrics(names)
        seen = 0
        jdict = []
        save_json = bool(getattr(args, "save_json", False))
        for batch in loader:
            img = jnp.asarray(batch["img"], jnp.float32) / 255.0
            det_b, n_b = self._infer(variables, img)
            det_b, n_b = np.asarray(det_b), np.asarray(n_b)
            for i in range(batch["n_real"]):
                meta = batch["meta"][i]
                seen += 1
                n = int(n_b[i])
                det = det_b[i, :n].copy()  # (n, 7) cx,cy,w,h,angle,conf,cls
                h0, w0 = meta["ori_shape"]
                r, (pw, ph) = meta["ratio_pad"]
                # undo letterbox: centers shift by pad then scale; sides scale
                cx, cy = (det[:, 0] - pw) / r, (det[:, 1] - ph) / r
                w, h = det[:, 2] / r, det[:, 3] / r
                pred_r = np.stack([cx, cy, w, h, det[:, 4]], 1) if n else np.zeros((0, 5), np.float32)
                if save_json and n:
                    self._pred_to_json(jdict, pred_r, det[:, 5], det[:, 6], meta["im_file"])
                gt_cls = meta["ori_cls"]
                ngt = int(meta["mask_gt"].sum())
                # original-frame PIXEL rboxes (fit in pixel space by the
                # dataset; rescaling a normalized rotated rect per-axis would
                # distort w/h for any non-square image)
                gr = meta.get("rboxes_ori")
                if gr is not None:
                    gr = gr[:ngt].copy()
                    if n and ngt:
                        import jax.numpy as _jnp

                        iou = np.asarray(probiou(_jnp.asarray(gr)[:, None], _jnp.asarray(pred_r)[None]))[..., 0]
                    else:
                        iou = np.zeros((ngt, n))
                    obb_m.update_batch(match_predictions(det[:, 6], gt_cls[:ngt], iou),
                                       det[:, 5], det[:, 6], gt_cls[:ngt])
        obb_m.process()
        self.metrics = obb_m
        res = obb_m.results_dict
        LOGGER.info(f"obb val: probiou mAP50-95 {obb_m.box.map:.4f}")
        if save_json and jdict:
            self._eval_json_dota(jdict, names, data or args.data)
        return res

    @staticmethod
    def _pred_to_json(jdict, rboxes, conf, cls, im_file):
        """COCO-style rotated entries (reference obb/val.py pred_to_json:
        image_id from the filename stem, 1-based category_id for non-coco,
        rbox [cx,cy,w,h,r] + 8-value poly, all in original-image space)."""
        from edgeyolo_tpu.ops.boxes import xywhr2xyxyxyxy

        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        polys = xywhr2xyxyxyxy(rboxes).reshape(-1, 8)
        for rb, p, sc, c in zip(rboxes, polys, conf, cls):
            jdict.append({
                "image_id": image_id,
                "category_id": int(c) + 1,
                "score": round(float(sc), 5),
                "rbox": [round(float(x), 3) for x in rb],
                "poly": [round(float(x), 3) for x in p],
            })

    def _eval_json_dota(self, jdict, names, data_yaml):
        """predictions.json + DOTA Task1 submission files, split and merged
        (reference obb/val.py eval_json:147-200: per-class Task1_{name}.txt;
        the merged pass re-offsets tile predictions by the __x___y window
        origin and runs class-offset rotated NMS at IoU 0.3 per source image)."""
        import json as _json
        import re as _re
        from collections import defaultdict

        from edgeyolo_tpu.ops.boxes import probiou, xywhr2xyxyxyxy

        self.save_dir.mkdir(parents=True, exist_ok=True)
        (self.save_dir / "predictions.json").write_text(_json.dumps(jdict))
        pred_txt = self.save_dir / "predictions_txt"
        pred_txt.mkdir(parents=True, exist_ok=True)
        LOGGER.info(f"saving DOTA-format predictions to {pred_txt}")
        for d in jdict:
            cname = str(names[d["category_id"] - 1]).replace(" ", "-")
            p = d["poly"]
            with open(pred_txt / f"Task1_{cname}.txt", "a") as f:
                f.write(f"{d['image_id']} {d['score']} " + " ".join(str(x) for x in p[:8]) + "\n")
        # merged submission only applies to DOTA-split tiles (name__scale__x___y)
        tile_pat = _re.compile(r"\d+___\d+")
        if not any(tile_pat.search(str(d["image_id"])) for d in jdict):
            return
        merged = defaultdict(list)
        for d in jdict:
            image_id = str(d["image_id"]).split("__")[0]
            x, y = (int(c) for c in tile_pat.findall(str(d["image_id"]))[0].split("___"))
            rb = list(d["rbox"])
            rb[0] += x
            rb[1] += y
            merged[image_id].append(rb + [d["score"], d["category_id"] - 1])
        out_dir = self.save_dir / "predictions_merged_txt"
        out_dir.mkdir(parents=True, exist_ok=True)
        for image_id, rows in merged.items():
            arr = np.asarray(rows, np.float32)  # (n, 7)
            max_wh = float(arr[:, :2].max()) * 2
            shifted = arr[:, :5].copy()
            shifted[:, :2] += arr[:, 6:7] * max_wh  # class-offset trick
            order = np.argsort(-arr[:, 5])
            keep = []
            for j in order:  # greedy rotated NMS at IoU 0.3 (host-side; tiny n)
                if all(float(np.asarray(probiou(jnp.asarray(shifted[j]),
                                                jnp.asarray(shifted[k])))[0]) < 0.3
                       for k in keep):
                    keep.append(int(j))
            kept = arr[keep]
            polys = xywhr2xyxyxyxy(kept[:, :5]).reshape(-1, 8)
            for row, p in zip(kept, polys):
                cname = str(names[int(row[6])]).replace(" ", "-")
                with open(out_dir / f"Task1_{cname}.txt", "a") as f:
                    f.write(f"{image_id} {round(float(row[5]), 3)} "
                            + " ".join(str(round(float(x), 3)) for x in p) + "\n")
