# Validate a torch-keyed CLASSIFY npz (exported from edgeyolo_tpu via
# utils.torch_convert.export_state_dict) with the REFERENCE classify val
# pipeline (top1/top5, models/yolo/classify/val.py). Run inside
# /root/reference with ref_shim on PYTHONPATH (the shim supplies
# torchvision.datasets.ImageFolder + transforms).
#   python ref_val_cls_from_npz.py <weights.npz> <model.yaml> <nc> <data_dir> <imgsz> <out.json>
import json
import os
import sys

import numpy as np
import torch

npz, model_yaml, nc, data_dir, imgsz, out_json = sys.argv[1:7]
nc, imgsz = int(nc), int(imgsz)

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO
from ultralytics.nn.tasks import ClassificationModel

tm = ClassificationModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert not missing, f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
tm.eval().float()

m = YOLO(model_yaml, task="classify")
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_dir, imgsz=imgsz, device="cpu", plots=False, verbose=False)
json.dump({
    "top1": float(metrics.top1),
    "top5": float(metrics.top5),
    "loaded": len(sd) - len(missing),
}, open(out_json, "w"))
print("ref cls val from npz:", open(out_json).read())
