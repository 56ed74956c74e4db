"""COCO-protocol evaluator sanity tests (pycocotools replacement)."""

import json

import numpy as np

from edgeyolo_tpu.metrics.coco_eval import evaluate_coco


def _write(tmp_path, gts, preds):
    gt = {
        "images": [{"id": i} for i in sorted({g["image_id"] for g in gts})],
        "annotations": [dict(g, id=i, area=g["bbox"][2] * g["bbox"][3]) for i, g in enumerate(gts)],
        "categories": [{"id": c} for c in sorted({g["category_id"] for g in gts})],
    }
    gp = tmp_path / "gt.json"
    pp = tmp_path / "pred.json"
    gp.write_text(json.dumps(gt))
    pp.write_text(json.dumps(preds))
    return gp, pp


def test_perfect_predictions_ap1(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "iscrowd": 0},
        {"image_id": 1, "category_id": 2, "bbox": [100, 100, 40, 40], "iscrowd": 0},
        {"image_id": 2, "category_id": 1, "bbox": [20, 20, 60, 60], "iscrowd": 0},
    ]
    preds = [dict(g, score=0.9) for g in gts]
    gp, pp = _write(tmp_path, gts, preds)
    m = evaluate_coco(gp, pp, verbose=False)
    assert m["AP"] > 0.99 and m["AP50"] > 0.99 and m["AP75"] > 0.99


def test_miss_half_ap_half(tmp_path):
    gts = [
        {"image_id": i, "category_id": 1, "bbox": [10, 10, 50, 50], "iscrowd": 0}
        for i in range(1, 5)
    ]
    preds = [dict(g, score=0.9) for g in gts[:2]]  # detect 2 of 4
    gp, pp = _write(tmp_path, gts, preds)
    m = evaluate_coco(gp, pp, verbose=False)
    assert 0.45 < m["AP50"] < 0.55


def test_false_positives_lower_ap(tmp_path):
    gts = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "iscrowd": 0}]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "score": 0.6},
        {"image_id": 1, "category_id": 1, "bbox": [300, 300, 50, 50], "score": 0.9},  # FP above TP
    ]
    gp, pp = _write(tmp_path, gts, preds)
    m = evaluate_coco(gp, pp, verbose=False)
    assert 0.3 < m["AP50"] < 0.7


def test_crowd_regions_dont_penalize(tmp_path):
    gts = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "iscrowd": 0},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 100, 100], "iscrowd": 1},
    ]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [210, 210, 50, 50], "score": 0.8},  # inside crowd
    ]
    gp, pp = _write(tmp_path, gts, preds)
    m = evaluate_coco(gp, pp, verbose=False)
    assert m["AP50"] > 0.99  # crowd match ignored, not an FP
