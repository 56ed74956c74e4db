#!/usr/bin/env python
"""Dump OUR segment val internals for cross-framework mask-IoU debugging:
per val image, det boxes/conf/cls, binarized proto-res pred masks, the
per-instance gt masks (post exclusivity), and the mask-IoU matrix — computed
exactly as engine/validator.py SegmentationValidator does in
mask_iou_res="proto" mode (the reference-default compare grid).

  python debug_seg_ours.py [out.npz] [run_dir] [n_images]
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "runs/segdbg_ours.npz"
RUN = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "runs/parity/segment"
N_IMG = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main():
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader, check_det_dataset
    from edgeyolo_tpu.ops import boxes as box_ops
    from edgeyolo_tpu.ops.nms import non_max_suppression

    m = YOLO(str(RUN / "train/last.msgpack"))
    model = m.model
    nc = model.nc
    cfgd = check_det_dataset(str(RUN / "data" / "dataset.yaml"))
    ds = YOLODataset(cfgd["val"], imgsz=320, augment=False, names=cfgd["names"],
                     task="segment", mask_ratio=4)
    bs = 8
    loader = build_dataloader(ds, bs, shuffle=False)

    save = {}
    gi = 0
    for batch in loader:
        img = jnp.asarray(batch["img"], jnp.float32) / 255.0
        out = model.apply(model.variables, img, train=False)
        pred = out["pred"]
        det, n, aidx = non_max_suppression(
            pred[..., : 4 + nc], conf_thres=0.001, iou_thres=0.7, max_det=300,
            max_nms=30000, multi_label=True, nc=nc, return_idx=True)
        coefs = jnp.take_along_axis(pred[..., 4 + nc:], aidx[..., None], axis=1)
        masks = jax.nn.sigmoid(jnp.einsum("bhwn,bdn->bdhw", out["proto"], coefs))
        scale = masks.shape[2] / img.shape[1]
        masks = jax.vmap(box_ops.crop_mask)(masks, det[..., :4] * scale)
        pm_all = (np.asarray(masks) > 0.5).astype(np.uint8)
        det = np.asarray(det)
        n = np.asarray(n)
        gt = np.asarray(batch["masks"]).astype(np.float32)  # (B,M,80,80)
        gval = np.asarray(batch["mask_gt"]) > 0
        gcls = np.asarray(batch["cls"])
        for i in range(batch["n_real"]):
            ni = int(n[i])
            pm = pm_all[i, :ni]
            gm = gt[i][gval[i]]
            # validator's exclusivity emulation (no-op if dataset masks are
            # already exclusive — recorded to verify that claim)
            areas = gm.sum((1, 2))
            a = np.where(gm > 0.5, areas[:, None, None], np.inf)
            gme = (gm * (a <= a.min(axis=0, keepdims=True))) if len(gm) else gm
            gmb = (gme > 0.5).astype(np.float32)
            inter = np.einsum("ghw,dhw->gd", gmb, pm.astype(np.float32))
            union = gmb.sum((1, 2))[:, None] + pm.sum((1, 2))[None, :] - inter
            iou = inter / (union + 1e-7)
            save[f"det{gi}"] = det[i, :ni]
            save[f"pm{gi}"] = pm
            save[f"gtm{gi}"] = gmb.astype(np.uint8)
            save[f"gt_raw{gi}"] = (gm > 0.5).astype(np.uint8)
            save[f"gt_cls{gi}"] = gcls[i][gval[i]]
            save[f"iou{gi}"] = iou
            gi += 1
            if gi >= N_IMG:
                break
        if gi >= N_IMG:
            break
    save["n_images"] = np.asarray(gi)
    np.savez_compressed(OUT, **save)
    print("saved", OUT, f"({gi} images)")


if __name__ == "__main__":
    main()
