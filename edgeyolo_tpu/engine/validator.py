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
from edgeyolo_tpu.metrics.metrics import ConfusionMatrix, DetMetrics, match_predictions, _box_iou_np
from edgeyolo_tpu.ops import boxes as box_ops
from edgeyolo_tpu.ops.nms import non_max_suppression
from edgeyolo_tpu.utils import LOGGER, colorstr


class DetectionValidator:
    """Runs the eval loop and computes detection metrics."""

    def __init__(self, args=None, save_dir: str | Path = "runs/val", names: dict | None = None):
        from edgeyolo_tpu.cfg import get_cfg

        self.args = args if args is not None else get_cfg(overrides={"mode": "val"})
        self.save_dir = Path(save_dir)
        self.names = names or {}
        self.metrics = None
        self.jdict = []
        self._loader = None  # cached across calls (epoch revalidation)
        self._infer = None

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
        if self._loader is None:
            dataset = YOLODataset(split, imgsz=imgsz, augment=False, names=names)
            self._loader = build_dataloader(dataset, bs, shuffle=False)
        loader = self._loader

        variables = variables if variables is not None else model.variables
        net = model.net
        nc = model.nc

        if self._infer is None:
            @jax.jit
            def infer(v, img):
                out = net.apply(v, img, train=False)
                pred = out["pred"]
                return non_max_suppression(
                    pred, conf_thres=conf, iou_thres=float(args.iou), max_det=int(args.max_det),
                    max_nms=max_nms, multi_label=True, agnostic=bool(args.single_cls), nc=nc,
                )

            self._infer = infer
        infer = self._infer

        metrics = DetMetrics(names)
        confusion = ConfusionMatrix(nc=len(names))
        seen = 0
        t_pre = t_inf = t_post = 0.0
        LOGGER.info(f"{colorstr('validating:')} {split} imgsz={imgsz} bs={bs} conf={conf}")

        for batch in loader:
            t0 = time.perf_counter()
            img = jnp.asarray(batch["img"], jnp.float32) / 255.0
            t1 = time.perf_counter()
            dets, nvalid = infer(variables, img)
            dets = np.asarray(jax.device_get(dets))
            nvalid = np.asarray(nvalid)
            t2 = time.perf_counter()

            for i in range(batch["n_real"]):
                meta = batch["meta"][i]
                seen += 1
                n = int(nvalid[i])
                det = dets[i, :n]  # (n,6) xyxy in letterbox space
                h0, w0 = meta["ori_shape"]
                r, (pw, ph) = meta["ratio_pad"]
                if n:
                    det = det.copy()
                    det[:, [0, 2]] = (det[:, [0, 2]] - pw) / r
                    det[:, [1, 3]] = (det[:, [1, 3]] - ph) / r
                    det[:, [0, 2]] = det[:, [0, 2]].clip(0, w0)
                    det[:, [1, 3]] = det[:, [1, 3]].clip(0, h0)
                # gt in native space
                gt_cls = meta["ori_cls"]
                gtb = meta["ori_bboxes"].copy()
                if len(gtb):
                    gtb = gtb * np.array([w0, h0, w0, h0], np.float32)
                    gtb = np.concatenate([gtb[:, :2] - gtb[:, 2:] / 2, gtb[:, :2] + gtb[:, 2:] / 2], 1)
                iou = _box_iou_np(gtb, det[:, :4]) if (n and len(gtb)) else np.zeros((len(gtb), n))
                tp = match_predictions(det[:, 5], gt_cls, iou)
                metrics.update_batch(tp, det[:, 4], det[:, 5], gt_cls)
                if args.plots:
                    confusion.process_batch(det if n else None, gtb, gt_cls)
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
            (self.save_dir / "predictions.json").write_text(json.dumps(self.jdict))
        return metrics.results_dict

    def _to_json(self, det: np.ndarray, im_file: str):
        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        box = det[:, :4].copy()
        box[:, 2:] -= box[:, :2]  # xywh (top-left)
        for b, d in zip(box.tolist(), det.tolist()):
            self.jdict.append({
                "image_id": image_id,
                "category_id": int(d[5]),
                "bbox": [round(x, 3) for x in b],
                "score": round(d[4], 5),
            })
