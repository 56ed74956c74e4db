"""Re-validate the round-4 OBB parity checkpoint on BOTH sides without
retraining (the first table was tanked by two val-harness artifacts, not by
the model: the reference's NMS wall-clock bailout zeroing 31/64 images at
bs=16, and our rotated NMS missing the reference's multi-label expansion +
matrix suppression rule — see PARITY.md obb section).

Run on the TPU host: our val uses the chip; the reference val runs in a CPU
subprocess exactly like tools/parity_run.py."""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.parity_run import ref_val  # noqa: E402

out = REPO / "runs" / "parity" / "obb"
data = out / "data"

from edgeyolo_tpu import YOLO  # noqa: E402

m = YOLO(str(out / "train" / "last.msgpack"))
ours = m.val(data=str(data), imgsz=320, plots=False)
print("[obb_reval] ours:", json.dumps({k: round(float(v), 6) for k, v in ours.items()}))

ref_json = out / "ref_val.json"
ref = ref_val("ref_val_obb_from_npz.py",
              [str(out / "weights_torch.npz"), "yolo11n-obb.yaml", "8",
               str(data), "320", str(ref_json)])
print("[obb_reval] ref:", json.dumps(ref))

pairs = {"mAP50-95": ("metrics/mAP50-95(B)", "map50_95"),
         "mAP50": ("metrics/mAP50(B)", "map50"),
         "mAP75": ("metrics/mAP75(B)", "map75"),
         "precision": ("metrics/precision(B)", "mp"),
         "recall": ("metrics/recall(B)", "mr")}
table, worst = {}, 0.0
for label, (ok, rk) in pairs.items():
    if ok not in ours or rk not in ref:
        continue
    o, r = float(ours[ok]), float(ref[rk])
    table[label] = {"ours": round(o, 6), "ref": round(r, 6), "absdiff": round(abs(o - r), 6)}
    worst = max(worst, abs(o - r))
res = {"task": "obb", "model": "yolo11n-obb.yaml", "epochs": 150, "imgsz": 320,
       "nc": 8, "reval": "post rotated-NMS parity fixes (no retrain)",
       "table": table, "worst_absdiff": round(worst, 6), "gate_0.02": worst <= 0.02}
(out / "parity.json").write_text(json.dumps(res, indent=1))
print(json.dumps(res, indent=1))
