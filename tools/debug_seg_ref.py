#!/usr/bin/env python
"""Dump the REFERENCE's segment val internals for cross-framework mask-IoU
debugging: per image, the scaled detections, binarized proto-res pred masks,
the gt index map, the expanded per-instance gt masks, the mask-IoU matrix and
the TP matrix — captured by wrapping SegmentationValidator._process_batch.

  python debug_seg_ref.py <weights.npz> <dataset.yaml> <out.npz> [imgsz]
"""
import os
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("YOLO_OFFLINE", "1")

npz_path, data_yaml, out_path = sys.argv[1:4]
imgsz = int(sys.argv[4]) if len(sys.argv) > 4 else 320

import torch  # noqa: E402

from ultralytics import YOLO  # noqa: E402
from ultralytics.models.yolo.segment.val import SegmentationValidator  # noqa: E402
from ultralytics.nn.tasks import SegmentationModel  # noqa: E402
from ultralytics.utils.metrics import mask_iou  # noqa: E402

tm = SegmentationModel("yolo11n-seg.yaml", ch=3, nc=8, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz_path).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

capt = []
orig = SegmentationValidator._process_batch


def patched(self, detections, gt_bboxes, gt_cls, pred_masks=None, gt_masks=None,
            overlap=False, masks=False):
    out = orig(self, detections, gt_bboxes, gt_cls, pred_masks, gt_masks, overlap, masks)
    if masks:
        # recompute the expanded gt + iou exactly as the original does, to
        # record the intermediate the TP matrix was built from
        gm = gt_masks
        if overlap:
            nl = len(gt_cls)
            index = torch.arange(nl, device=gm.device).view(nl, 1, 1) + 1
            gm = gm.repeat(nl, 1, 1)
            gm = torch.where(gm == index, 1.0, 0.0)
        if gm.shape[1:] != pred_masks.shape[1:]:
            gm = torch.nn.functional.interpolate(
                gm[None], pred_masks.shape[1:], mode="bilinear", align_corners=False
            )[0].gt_(0.5)
        iou = mask_iou(gm.reshape(gm.shape[0], -1).float(),
                       pred_masks.reshape(pred_masks.shape[0], -1).float())
        capt.append(dict(
            det=detections.cpu().numpy(),
            gt_cls=gt_cls.cpu().numpy(),
            gt_index_map=gt_masks.cpu().numpy(),
            gtm=gm.cpu().numpy().astype(np.uint8),
            pm=pred_masks.cpu().numpy().astype(np.uint8),
            iou=iou.cpu().numpy(),
            tp_m=out.cpu().numpy(),
        ))
    return out


SegmentationValidator._process_batch = patched

m = YOLO("yolo11n-seg.yaml", task="segment")
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False,
                verbose=False, rect=False)
print("ref mask mAP50-95:", float(metrics.seg.map), "mAP50:", float(metrics.seg.map50))

save = {"n_images": np.asarray(len(capt))}
for i, c in enumerate(capt):
    for k, v in c.items():
        save[f"{k}{i}"] = v
np.savez_compressed(out_path, **save)
print("saved", out_path, f"({len(capt)} images)")
