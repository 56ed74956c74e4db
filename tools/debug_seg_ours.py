#!/usr/bin/env python
"""Dump our segment val internals (first N val images) for cross-framework
mask-IoU debugging: det boxes/conf/cls, binarized proto-res pred masks, GT
instance masks, and the mask-IoU matrix."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

OUT = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "runs/segdbg_ours.npz"
N_IMG = 4


def main():
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu import YOLO
    from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader, check_det_dataset
    from edgeyolo_tpu.ops import boxes as box_ops
    from edgeyolo_tpu.ops.nms import non_max_suppression

    run = REPO / "runs/parity/segment"
    m = YOLO(str(run / "train/last.msgpack"))
    model = m.model
    nc = model.nc
    cfgd = check_det_dataset(str(run / "data"))
    ds = YOLODataset(cfgd["val"], imgsz=320, augment=False, names=cfgd["names"],
                     task="segment", mask_ratio=4)
    loader = build_dataloader(ds, N_IMG, shuffle=False)
    batch = next(iter(loader))
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
    pm = (np.asarray(masks) > 0.5).astype(np.uint8)
    save = {"det": np.asarray(det), "n": np.asarray(n),
            "gt": np.asarray(batch["masks"]), "gtcls": np.asarray(batch["cls"]),
            "gtmask_valid": np.asarray(batch["mask_gt"])}
    for i in range(N_IMG):
        save[f"pm{i}"] = pm[i, : int(n[i])]
    np.savez(OUT, **save)
    print("saved", OUT, "n=", n)


if __name__ == "__main__":
    main()
