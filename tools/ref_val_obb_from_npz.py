# Validate a torch-keyed OBB npz (exported from edgeyolo_tpu via
# utils.torch_convert.export_state_dict) with the REFERENCE obb val pipeline
# (probiou matching + rotated NMS, models/yolo/obb/val.py:39,114).
# Run inside /root/reference with ref_shim on PYTHONPATH.
#   python ref_val_obb_from_npz.py <weights.npz> <model.yaml> <nc> <dataset.yaml> <imgsz> <out.json>
import json
import os
import sys

import numpy as np
import torch

npz, model_yaml, nc, data_yaml, imgsz, out_json = sys.argv[1:7]
nc, imgsz = int(nc), int(imgsz)

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO
from ultralytics.nn.tasks import OBBModel

tm = OBBModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

m = YOLO(model_yaml, task="obb")
m.model = tm
m.model.args = m.overrides
# the reference's own OBB print_results trips a %-format mismatch (its pf
# string carries an extra mAP75 column); metrics are computed before printing
from ultralytics.models.yolo.detect.val import DetectionValidator as _DV

_DV.print_results = lambda self: None
# batch=2, NOT the default 16: the reference's NMS carries a wall-clock
# bailout (ops.py:311, 2.0 + 0.05*bs seconds per batch) and crowded rotated
# NMS on CPU exceeds it at bs=16 — the loop then silently returns ZERO
# detections for the rest of the batch, which tanked the first round-4 obb
# table to 0.42 mAP (31 of 64 images empty). At bs=2 postprocess is ~0.4s
# per batch against a 2.1s limit.
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False, verbose=False, rect=False, batch=2)
json.dump({
    "map50_95": float(metrics.box.map),
    "map50": float(metrics.box.map50),
    "map75": float(metrics.box.map75),
    "loaded": len(sd) - len(missing),
}, open(out_json, "w"))
print("ref obb val from npz:", open(out_json).read())
