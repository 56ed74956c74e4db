# Dump reference task-model (seg/pose/obb) state_dict + eval forward.
import sys

import numpy as np
import torch

cfg, task, out_npz, imgsz = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
torch.manual_seed(0)
from ultralytics.nn.tasks import OBBModel, PoseModel, SegmentationModel

cls = {"segment": SegmentationModel, "pose": PoseModel, "obb": OBBModel}[task]
m = cls(cfg, ch=3, verbose=False).eval().float()
x = torch.from_numpy(np.random.RandomState(42).rand(1, 3, imgsz, imgsz).astype(np.float32))
with torch.no_grad():
    y = m(x)
extra = {}
pred = y[0] if isinstance(y, (list, tuple)) else y
if isinstance(y, (list, tuple)) and len(y) > 1:
    aux = y[1]
    if isinstance(aux, (list, tuple)):
        for i, t in enumerate(aux):
            if isinstance(t, torch.Tensor):
                extra[f"__aux{i}__"] = t.numpy()
    elif isinstance(aux, torch.Tensor):
        extra["__aux0__"] = aux.numpy()
sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
np.savez(out_npz, __pred__=pred.numpy(), __input__=x.numpy(), **extra, **sd)
print("pred", tuple(pred.shape), "aux", [k for k in extra])
