#!/usr/bin/env python
"""Trained-weight cross-framework parity driver (round-4 scaled protocol).

Protocol (PARITY.md): generate a CROWDED synthetic dataset (default 64 train
/ 64 val images at 320px, nc=8, 4-10 instances each, sizes 0.06-0.28 — a
~10x larger instance count than round 3's 8-image sample, dropping the
per-detection mAP noise below the 0.02 gate), train HERE, val HERE, export
the flax tree to a torch-keyed npz, then the REFERENCE loads the identical
weights into its own model and vals them through its own pipeline
(subprocess in /root/reference with tools/ref_shim on PYTHONPATH).

Usage:
  python tools/parity_run.py <task> [epochs] [out_dir]
  tasks: detect flagship segment pose obb classify world v10
Emits <out_dir>/<task>/parity.json with ours/ref/absdiff columns.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DIR = Path("/root/reference")
SHIM = REPO / "tools" / "ref_shim"

# task -> (our model yaml, reference model yaml, gen task, ref val script)
TASKS = {
    "detect": ("yolo11n.yaml", "yolo11n.yaml", "detect", "ref_val_from_npz.py"),
    "flagship": ("edgeline-yolo.yaml", "yolo11-test.yaml", "detect", "ref_val_from_npz.py"),
    "segment": ("yolo11n-seg.yaml", "yolo11n-seg.yaml", "segment", "ref_val_seg_from_npz.py"),
    "pose": ("yolo11n-pose.yaml", "yolo11n-pose.yaml", "pose", "ref_val_pose_from_npz.py"),
    "obb": ("yolo11n-obb.yaml", "yolo11n-obb.yaml", "obb", "ref_val_obb_from_npz.py"),
    "classify": ("yolo11n-cls.yaml", "yolo11n-cls.yaml", "classify", "ref_val_cls_from_npz.py"),
    "v10": ("yolov10n.yaml", "yolov10n.yaml", "detect", "ref_val_from_npz.py"),
    "rtdetr": ("rtdetr-l.yaml", "rtdetr-l.yaml", "detect", "ref_val_rtdetr_from_npz.py"),
    "world": ("yolov8s-worldv2.yaml", "yolov8s-worldv2.yaml", "detect", "ref_val_world_from_npz.py"),
}

NC = 8
IMGSZ = 320


def gen_data(task_gen: str, out: Path):
    from edgeyolo_tpu.data.synthetic import generate_classify_dataset, generate_dataset

    if task_gen == "classify":
        return generate_classify_dataset(out / "data", nc=NC, n_train_per_class=16,
                                         n_val_per_class=8, seed=0)
    return generate_dataset(out / "data", n_train=64, n_val=64, imgsz=IMGSZ, nc=NC,
                            min_objs=4, max_objs=10, min_size=0.06, max_size=0.28,
                            seed=0, task=task_gen)


def ref_val(script: str, args: list[str]) -> dict:
    out_json = args[-1]
    env = dict(os.environ,
               PYTHONPATH=f"{SHIM}:{REF_DIR}",
               YOLO_OFFLINE="1", JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    cmd = [sys.executable, str(REPO / "tools" / script), *args]
    r = subprocess.run(cmd, cwd=str(REF_DIR), env=env,
                       capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(f"ref val failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    return json.loads(Path(out_json).read_text())


def rtdetr_matcher_audit(m, data_yaml, n_batches: int = 4) -> dict:
    """Auction-vs-Hungarian on REAL training cost matrices (round-3 verdict
    #2: 'empirically optimal on random instances' is a unit claim; this
    audits the trained model's actual matrices). For each image: build the
    exact matcher cost via RTDETRDetectionLoss.match_cost, assign with the
    in-jit auction and with scipy's exact Hungarian, compare assignment sets
    and total costs."""
    import jax.numpy as jnp
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from edgeyolo_tpu.data.dataset import build_dataloader, check_det_dataset
    from edgeyolo_tpu.data.dataset import YOLODataset
    from edgeyolo_tpu.train.detr_loss import RTDETRDetectionLoss, auction_assign

    cfgd = check_det_dataset(str(data_yaml))
    ds = YOLODataset(cfgd["train"], imgsz=IMGSZ, augment=False, names=cfgd["names"])
    loader = build_dataloader(ds, 8, shuffle=False, seed=0)
    crit = RTDETRDetectionLoss(m.model)
    v = m.model.variables
    n_img = n_ident = 0
    gap_sum = worst_gap = 0.0
    hung_total = 0.0
    for bi, batch in enumerate(loader):
        if bi >= n_batches:
            break
        img01 = jnp.asarray(batch["img"], jnp.float32) / 255.0
        out = m.model.net.apply(v, img01, train=True, mutable=["batch_stats"])[0]
        dec_b, dec_s = out["feats"]
        for i in range(dec_s.shape[0]):
            mg = np.asarray(batch["mask_gt"][i]) > 0
            if not mg.any():
                continue
            cost = np.asarray(crit.match_cost(
                dec_s[i], dec_b[i],
                jnp.asarray(batch["cls"][i]).astype(jnp.int32),
                jnp.asarray(batch["bboxes"][i], jnp.float32),
                jnp.asarray(batch["mask_gt"][i], jnp.float32)))
            col = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(mg)))
            rows = np.nonzero(mg)[0]
            r_idx, c_idx = linear_sum_assignment(cost[rows])
            hcost = float(cost[rows][r_idx, c_idx].sum())
            assert (col[rows] >= 0).all(), "auction left a valid gt unassigned"
            acost = float(cost[rows, col[rows]].sum())
            gap = acost - hcost  # >= 0; auction is eps-optimal
            n_img += 1
            n_ident += int(set(zip(rows.tolist(), col[rows].tolist()))
                           == set(zip(rows[r_idx].tolist(), c_idx.tolist())))
            gap_sum += gap
            hung_total += abs(hcost)
            worst_gap = max(worst_gap, gap)
    return {"images": n_img, "identical_assignments": n_ident,
            "mean_cost_gap": round(gap_sum / max(n_img, 1), 8),
            "worst_cost_gap": round(worst_gap, 8),
            "rel_cost_gap": round(gap_sum / max(hung_total, 1e-9), 8)}


def main():
    task = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    out = Path(sys.argv[3]) if len(sys.argv) > 3 else REPO / "runs" / "parity"
    model_yaml, ref_yaml, gen_task, script = TASKS[task]
    out = (out / task).resolve()
    out.mkdir(parents=True, exist_ok=True)

    import numpy as np

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.utils.torch_convert import export_state_dict

    data = gen_data(gen_task, out)
    t0 = time.time()
    key_fn = None
    if task == "rtdetr":
        from edgeyolo_tpu import RTDETR
        from edgeyolo_tpu.utils.torch_convert import rtdetr_torch_key

        m = RTDETR(Path(model_yaml).stem)
        key_fn = rtdetr_torch_key
        # transformer decoder: AdamW at detr-style lr, not SGD 0.01
        opt = dict(optimizer="AdamW", lr0=0.0002, weight_decay=0.0001)
    else:
        m = YOLO(model_yaml)
        opt = dict(optimizer="SGD", lr0=0.01)
    if task == "world":
        # fixed shared text embeddings on BOTH sides (reference world
        # training freezes the per-dataset text bank, world/train.py:24;
        # CLIP itself is offline-gated, so a deterministic unit-norm matrix
        # stands in as the shared bank)
        from edgeyolo_tpu.data.synthetic import class_names

        emb = np.random.RandomState(7).randn(NC, 512).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        np.savez(out / "text_emb.npz", emb=emb)
        m.model.set_classes(emb, names=class_names(NC))
    imgsz = 128 if task == "classify" else IMGSZ
    train_kw = dict(data=str(data), epochs=epochs, imgsz=imgsz, batch=16,
                    amp=False, val=False, plots=False, cache="ram",
                    workers=0, seed=0, project=str(out), name="train",
                    exist_ok=True, patience=epochs, **opt)
    m.train(**train_kw)
    t_train = time.time() - t0
    print(f"[parity:{task}] trained {epochs} epochs in {t_train:.0f}s")

    ours_native = None
    if task == "segment":
        # the reference's DEFAULT val path compares masks at PROTO resolution
        # (process_mask upsample=False, segment/val.py:52); gate the parity
        # table on the like-for-like proto comparison, and record our
        # higher-fidelity native-resolution metric alongside (PARITY.md §seg)
        from edgeyolo_tpu.cfg import get_cfg
        from edgeyolo_tpu.engine.validator import SegmentationValidator

        vargs = get_cfg(overrides={"mode": "val", "task": "segment",
                                   "data": str(data), "imgsz": imgsz,
                                   "plots": False})
        ours_native = SegmentationValidator(
            vargs, save_dir=out / "val_native")(m.model, data=str(data))
        ours = SegmentationValidator(
            vargs, save_dir=out / "val_proto",
            mask_iou_res="proto")(m.model, data=str(data))
        print(f"[parity:{task}] ours (native): "
              f"{json.dumps({k: round(float(v), 4) for k, v in ours_native.items()})}")
    else:
        ours = m.val(data=str(data), imgsz=imgsz, plots=False)
    print(f"[parity:{task}] ours: {json.dumps({k: round(float(v), 4) for k, v in ours.items()})}")

    if task == "rtdetr":
        from edgeyolo_tpu.utils.torch_convert import export_rtdetr_state_dict

        sd = export_rtdetr_state_dict(m.model.variables)
    else:
        sd = export_state_dict(m.model.variables, key_fn=key_fn)
    npz = out / "weights_torch.npz"
    np.savez(npz, **sd)

    ref_json = out / "ref_val.json"
    if task == "world":
        args = [str(npz), ref_yaml, str(NC), str(out / "text_emb.npz"),
                str(data), str(imgsz), str(ref_json)]
    elif task == "classify":
        args = [str(npz), ref_yaml, str(NC), str(data), str(imgsz), str(ref_json)]
    elif task == "pose":
        args = [str(npz), ref_yaml, str(NC), "5", "3", str(data), str(imgsz), str(ref_json)]
    else:
        args = [str(npz), ref_yaml, str(NC), str(data), str(imgsz), str(ref_json)]
    ref = ref_val(script, args)
    print(f"[parity:{task}] ref: {json.dumps(ref)}")

    if task == "classify":
        pairs = {"top1": ("metrics/accuracy_top1", "top1"),
                 "top5": ("metrics/accuracy_top5", "top5")}
    elif task == "segment":
        pairs = {"box mAP50-95": ("metrics/mAP50-95(B)", "box_map50_95"),
                 "box mAP50": ("metrics/mAP50(B)", "box_map50"),
                 "mask mAP50-95": ("metrics/mAP50-95(M)", "mask_map50_95"),
                 "mask mAP50": ("metrics/mAP50(M)", "mask_map50")}
    elif task == "pose":
        pairs = {"box mAP50-95": ("metrics/mAP50-95(B)", "box_map50_95"),
                 "box mAP50": ("metrics/mAP50(B)", "box_map50"),
                 "pose mAP50-95": ("metrics/mAP50-95(P)", "pose_map50_95"),
                 "pose mAP50": ("metrics/mAP50(P)", "pose_map50")}
    else:
        pairs = {"mAP50-95": ("metrics/mAP50-95(B)", "map50_95"),
                 "mAP50": ("metrics/mAP50(B)", "map50"),
                 "mAP75": ("metrics/mAP75(B)", "map75"),
                 "precision": ("metrics/precision(B)", "mp"),
                 "recall": ("metrics/recall(B)", "mr")}

    table = {}
    worst = 0.0
    for label, (ok, rk) in pairs.items():
        if ok not in ours or rk not in ref:
            continue
        o, r = float(ours[ok]), float(ref[rk])
        table[label] = {"ours": round(o, 6), "ref": round(r, 6),
                        "absdiff": round(abs(o - r), 6)}
        worst = max(worst, abs(o - r))
    result = {"task": task, "model": model_yaml, "ref_model": ref_yaml,
              "epochs": epochs, "imgsz": imgsz, "nc": NC,
              "train_s": round(t_train, 1), "table": table,
              "worst_absdiff": round(worst, 6), "gate_0.02": worst <= 0.02}
    if ours_native is not None:
        result["ours_native_mask"] = {
            "mask mAP50-95": round(float(ours_native["metrics/mAP50-95(M)"]), 6),
            "mask mAP50": round(float(ours_native["metrics/mAP50(M)"]), 6)}
    if task == "rtdetr":
        result["matcher_audit"] = rtdetr_matcher_audit(m, data)
        print(f"[parity:rtdetr] matcher audit: {json.dumps(result['matcher_audit'])}")
    (out / "parity.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
