# Train + val the torch reference on a (synthetic) YOLO dataset; emit JSON.
# Run inside /root/reference with ref_shim on PYTHONPATH (torch cpu).
#   python ref_train_val.py <dataset.yaml> <out.json> [epochs] [imgsz]
import json
import sys

data_yaml, out_json = sys.argv[1], sys.argv[2]
epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
imgsz = int(sys.argv[4]) if len(sys.argv) > 4 else 96

import os

os.environ.setdefault("YOLO_OFFLINE", "1")
from ultralytics import YOLO

m = YOLO("yolo11n.yaml")
m.train(data=data_yaml, epochs=epochs, imgsz=imgsz, batch=4, workers=0,
        device="cpu", val=False, plots=False, mosaic=1.0, amp=False,
        close_mosaic=4, verbose=False, seed=0, deterministic=True)
metrics = m.val(data=data_yaml, imgsz=imgsz, device="cpu", plots=False, verbose=False)
best = str(m.trainer.best if m.trainer.best.exists() else m.trainer.last)
json.dump({
    "map50_95": float(metrics.box.map),
    "map50": float(metrics.box.map50),
    "map75": float(metrics.box.map75),
    "mp": float(metrics.box.mp),
    "mr": float(metrics.box.mr),
    "best": best,
}, open(out_json, "w"))
print("ref train+val done:", open(out_json).read())
