# Validate a torch-keyed YOLO-World npz (exported from edgeyolo_tpu) with the
# REFERENCE val pipeline, with FIXED shared text embeddings injected on both
# sides (the round-4 world parity protocol: reference set_classes needs CLIP,
# which is offline-gated in this image, so both frameworks consume the SAME
# precomputed unit-norm embedding matrix — reference WorldModel txt_feats
# buffer, nn/tasks.py:630,650-651).
# Run inside /root/reference with ref_shim on PYTHONPATH.
#   python ref_val_world_from_npz.py <weights.npz> <model.yaml> <nc> <emb.npz> <dataset.yaml> <imgsz> <out.json>
import json
import os
import sys

import numpy as np
import torch

npz, model_yaml, nc, emb_npz, data_yaml, imgsz, out_json = sys.argv[1:8]
nc = int(nc)
imgsz = int(imgsz)

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO
from ultralytics.nn.tasks import WorldModel

tm = WorldModel(model_yaml, ch=3, nc=nc, verbose=False)
sd = {k: torch.from_numpy(v) for k, v in np.load(npz).items()}
missing, unexpected = tm.load_state_dict(sd, strict=False)
assert all("dfl" in k for k in missing), f"missing: {missing[:8]}"
assert not unexpected, f"unexpected: {unexpected[:8]}"
emb = np.load(emb_npz)["emb"].astype(np.float32)
tm.txt_feats = torch.from_numpy(emb).reshape(1, nc, -1)
tm.model[-1].nc = nc
tm.eval().float()

m = YOLO(model_yaml, task="detect")
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
print("ref world val from npz:", open(out_json).read())
