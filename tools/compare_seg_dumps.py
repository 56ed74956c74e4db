#!/usr/bin/env python
"""Compare ours-vs-reference segment val internals image by image, order-
invariantly: GT instances are paired by maximal pixel overlap (the reference
reorders instances area-descending at Format time), detections by (cls, box)
proximity. Reports per-stage disagreement so the FIRST diverging stage is
visible.

  python compare_seg_dumps.py runs/segdbg_ours.npz runs/segdbg_ref.npz [v]
"""
import sys

import numpy as np

ours = np.load(sys.argv[1])
ref = np.load(sys.argv[2])
verbose = len(sys.argv) > 3
n = min(int(ours["n_images"]), int(ref["n_images"]))
THR = np.linspace(0.5, 0.95, 10)


def pair_masks(a, b):
    """Greedy max-overlap pairing of (Na,h,w) vs (Nb,h,w) binary masks."""
    inter = np.einsum("ahw,bhw->ab", a.astype(np.float32), b.astype(np.float32))
    un = a.sum((1, 2))[:, None] + b.sum((1, 2))[None, :] - inter
    iou = inter / (un + 1e-9)
    pairs = []
    used_a, used_b = set(), set()
    for _ in range(min(len(a), len(b))):
        i, j = np.unravel_index(np.argmax(iou), iou.shape)
        if iou[i, j] <= 0:
            break
        pairs.append((i, j, iou[i, j]))
        iou[i, :] = -1
        iou[:, j] = -1
    return pairs


def match_tp(iou, pred_cls, gt_cls):
    tp = np.zeros((iou.shape[1], len(THR)), bool)
    io = np.where(gt_cls[:, None] == pred_cls[None, :], iou, 0.0)
    for ti, t in enumerate(THR):
        matches = np.argwhere(io >= t)
        if matches.shape[0]:
            order = io[matches[:, 0], matches[:, 1]].argsort()[::-1]
            matches = matches[order]
            matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
            matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            tp[matches[:, 1], ti] = True
    return tp


tot = dict(gt_pair_px=0, gt_px_tot=0, pm_pair_px=0, pm_px_tot=0, det_unpaired=0,
           gt_unpaired=0, tp_ours=np.zeros(10, int), tp_ref=np.zeros(10, int))
worst = []
for i in range(n):
    do, dr = ours[f"det{i}"], ref[f"det{i}"]
    pmo, pmr = ours[f"pm{i}"], ref[f"pm{i}"]
    gmo, gmr = ours[f"gtm{i}"], ref[f"gtm{i}"]

    gp = pair_masks(gmo, gmr)
    for a, b, _ in gp:
        d = int((gmo[a] != gmr[b]).sum())
        tot["gt_pair_px"] += d
        tot["gt_px_tot"] += int(gmr[b].size)
    tot["gt_unpaired"] += abs(len(gmo) - len(gmr)) + (min(len(gmo), len(gmr)) - len(gp))

    pp = pair_masks(pmo, pmr)
    img_pm = 0
    for a, b, pi in pp:
        d = int((pmo[a] != pmr[b]).sum())
        img_pm += d
        tot["pm_pair_px"] += d
        tot["pm_px_tot"] += int(pmr[b].size)
        if verbose and pi < 0.8 and max(pmo[a].sum(), pmr[b].sum()) > 50:
            worst.append((i, a, b, pi, do[a], dr[b]))
    tot["det_unpaired"] += abs(len(pmo) - len(pmr)) + (min(len(pmo), len(pmr)) - len(pp))

    tpo = match_tp(ours[f"iou{i}"], do[:, 5], ours[f"gt_cls{i}"])
    tpr = ref[f"tp_m{i}"]
    tot["tp_ours"] += tpo.sum(0)
    tot["tp_ref"] += tpr.sum(0)

print(f"{n} images")
print(f"gt  paired-mask bit-disagreement: {tot['gt_pair_px']}/{tot['gt_px_tot']}"
      f" = {tot['gt_pair_px'] / max(tot['gt_px_tot'], 1):.2e};"
      f" unpaired {tot['gt_unpaired']}")
print(f"pred paired-mask bit-disagreement: {tot['pm_pair_px']}/{tot['pm_px_tot']}"
      f" = {tot['pm_pair_px'] / max(tot['pm_px_tot'], 1):.2e};"
      f" unpaired {tot['det_unpaired']}")
print(f"TP@0.5..0.95 ours {tot['tp_ours'].tolist()}")
print(f"TP@0.5..0.95 ref  {tot['tp_ref'].tolist()}")
for w in worst[:20]:
    i, a, b, pi, da, db = w
    print(f"  worst-pair img{i} ours#{a} ref#{b} iou {pi:.3f} "
          f"conf {da[4]:.3f}/{db[4]:.3f} cls {da[5]:.0f}/{db[5]:.0f}")
