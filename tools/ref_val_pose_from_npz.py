# Validate a torch-keyed POSE npz (exported from edgeyolo_tpu via
# utils.torch_convert.export_state_dict) with the REFERENCE pose val pipeline
# (OKS keypoint matching, models/yolo/pose/val.py:159).
# Run inside /root/reference with ref_shim on PYTHONPATH.
#   python ref_val_pose_from_npz.py <weights.npz> <model.yaml> <nc> <kpt> <kdim> <dataset.yaml> <imgsz> <out.json>
import json
import os
import sys

import numpy as np
import torch

npz, model_yaml, nc, kpt, kdim, data_yaml, imgsz, out_json = sys.argv[1:9]
nc, kpt, kdim, imgsz = int(nc), int(kpt), int(kdim), int(imgsz)

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO
from ultralytics.nn.tasks import PoseModel

tm = PoseModel(model_yaml, ch=3, nc=nc, data_kpt_shape=(kpt, kdim), verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

m = YOLO(model_yaml, task="pose")
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False, verbose=False, rect=False)
json.dump({
    "box_map50_95": float(metrics.box.map),
    "box_map50": float(metrics.box.map50),
    "pose_map50_95": float(metrics.pose.map),
    "pose_map50": float(metrics.pose.map50),
    "loaded": len(sd) - len(missing),
}, open(out_json, "w"))
print("ref pose val from npz:", open(out_json).read())
