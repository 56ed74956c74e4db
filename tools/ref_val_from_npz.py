# Validate a torch-keyed npz (exported from edgeyolo_tpu via
# utils.torch_convert.export_state_dict) with the REFERENCE val pipeline.
# Run inside /root/reference with ref_shim on PYTHONPATH.
#   python ref_val_from_npz.py <weights.npz> <model.yaml> <nc> <dataset.yaml> <imgsz> <out.json>
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
from ultralytics.nn.tasks import DetectionModel

tm = DetectionModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
# only the frozen DFL arange conv may be absent from the export
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

m = YOLO(model_yaml, task="detect")  # GFLv2 heads aren't in the facade's guess table
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False, verbose=False, rect=False)
json.dump({
    "map50_95": float(metrics.box.map),
    "map50": float(metrics.box.map50),
    "map75": float(metrics.box.map75),
    "mp": float(metrics.box.mp),
    "mr": float(metrics.box.mr),
    "loaded": len(sd) - len(missing),
}, open(out_json, "w"))
print("ref val from npz:", open(out_json).read())
