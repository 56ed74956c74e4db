# Dump reference model state_dict + eval forward on a fixed input (subprocess; torch cpu).
import sys, numpy as np, torch
cfg, out_npz, imgsz = sys.argv[1], sys.argv[2], int(sys.argv[3])
torch.manual_seed(0)
from ultralytics.nn.tasks import DetectionModel
m = DetectionModel(cfg, ch=3, nc=80, verbose=False)
m.eval().float()
x = torch.from_numpy(np.random.RandomState(42).rand(1, 3, imgsz, imgsz).astype(np.float32))
with torch.no_grad():
    y = m(x)
pred = y[0] if isinstance(y, (list, tuple)) else y
sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
np.savez(out_npz, __pred__=pred.numpy(), __input__=x.numpy(), **sd)
print("pred", tuple(pred.shape), "keys", len(sd))
