# Validate a torch-keyed RT-DETR npz (exported from edgeyolo_tpu via
# utils.torch_convert.export_state_dict(key_fn=rtdetr_torch_key)) with the
# REFERENCE RT-DETR val pipeline (query top-300 NMS-free postprocess,
# models/rtdetr/val.py). Run inside /root/reference with ref_shim on
# PYTHONPATH.
#   python ref_val_rtdetr_from_npz.py <weights.npz> <model.yaml> <nc> <dataset.yaml> <imgsz> <out.json>
import json
import os
import sys

import numpy as np
import torch

npz, model_yaml, nc, data_yaml, imgsz, out_json = sys.argv[1:7]
nc = int(nc)
imgsz = int(imgsz)

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import RTDETR
from ultralytics.nn.tasks import RTDETRDetectionModel

tm = RTDETRDetectionModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert not unexpected, f"unexpected: {unexpected[:8]}"
# anchors/valid_mask are shape-derived buffers; nothing learnable may be absent
learnable = [k for k in missing if not k.endswith((".anchors", ".valid_mask"))]
assert not learnable, f"missing learnable keys: {learnable[:8]}"
tm.eval().float()
# hand-constructed models miss the ckpt-attached attrs AutoBackend reads
tm.stride = torch.tensor([32.0])
tm.names = {i: str(i) for i in range(nc)}

m = RTDETR(model_yaml)  # task_map -> RTDETRValidator (models/rtdetr/val.py)
m.model = tm
m.model.args = m.overrides
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False,
                verbose=False, rect=False)
json.dump({
    "map50_95": float(metrics.box.map),
    "map50": float(metrics.box.map50),
    "map75": float(metrics.box.map75),
    "mp": float(metrics.box.mp),
    "mr": float(metrics.box.mr),
    "loaded": len(sd) - len(missing),
}, open(out_json, "w"))
print("ref rtdetr val from npz:", open(out_json).read())
