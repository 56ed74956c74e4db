# Validate a torch-keyed npz segmentation model with the reference val pipeline.
#   python ref_val_seg_from_npz.py <weights.npz> <model.yaml> <nc> <dataset.yaml> <imgsz> <out.json>
import json
import sys

import numpy as np
import torch

npz, model_yaml, nc, data_yaml, imgsz, out_json = sys.argv[1:7]
nc = int(nc)
imgsz = int(imgsz)

import os

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO
from ultralytics.nn.tasks import SegmentationModel

tm = SegmentationModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

m = YOLO(model_yaml, task="segment")
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False, verbose=False, rect=False)
json.dump({
    "box_map50_95": float(metrics.box.map),
    "box_map50": float(metrics.box.map50),
    "mask_map50_95": float(metrics.seg.map),
    "mask_map50": float(metrics.seg.map50),
}, open(out_json, "w"))
print("ref seg val:", open(out_json).read())
