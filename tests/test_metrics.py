"""Metric-stack unit tests: AP computation, matching, confusion matrix."""

import numpy as np

from edgeyolo_tpu.metrics.metrics import (
    ConfusionMatrix,
    DetMetrics,
    ap_per_class,
    compute_ap,
    match_predictions,
)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap([1.0], [1.0])
    assert ap > 0.99


def test_compute_ap_zero():
    ap, _, _ = compute_ap([0.0], [0.0])
    assert ap < 0.02


def test_match_predictions_basic():
    # one gt, two predictions of same class: higher-IoU one is TP at 0.5
    pred_cls = np.array([0.0, 0.0])
    true_cls = np.array([0.0])
    iou = np.array([[0.9, 0.55]])  # (M=1, N=2)
    correct = match_predictions(pred_cls, true_cls, iou)
    assert correct[0, 0] and not correct[1, 0]  # unique matching: only one TP
    # at IoU threshold 0.95 nothing matches except the 0.9<0.95 -> none
    assert not correct[:, 9].any()


def test_match_predictions_class_gate():
    pred_cls = np.array([1.0])
    true_cls = np.array([0.0])
    iou = np.array([[0.99]])
    correct = match_predictions(pred_cls, true_cls, iou)
    assert not correct.any()


def test_ap_per_class_perfect_detector():
    n = 20
    tp = np.ones((n, 10), dtype=bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    res = ap_per_class(tp, conf, pred_cls, target_cls)
    assert res["ap"][0, 0] > 0.95
    assert res["p"][0] > 0.95 and res["r"][0] > 0.95


def test_ap_per_class_half_fp():
    n = 40
    tp = np.zeros((n, 10), dtype=bool)
    tp[::2] = True  # every other detection is a TP
    conf = np.linspace(0.9, 0.5, n)
    res = ap_per_class(tp, conf, np.zeros(n), np.zeros(20))
    assert 0.3 < res["ap"][0, 0] <= 1.0


def test_det_metrics_fitness_is_map5095():
    dm = DetMetrics({0: "a"})
    tp = np.ones((10, 10), dtype=bool)
    dm.update_batch(tp, np.linspace(0.9, 0.5, 10), np.zeros(10), np.zeros(10))
    dm.process()
    d = dm.results_dict
    assert abs(d["fitness"] - d["metrics/mAP50-95(B)"]) < 1e-9
    assert "metrics/mAP75(B)" in d  # fork extra column


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=2)
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    gt_cls = np.array([0, 1])
    det = np.array([[0, 0, 10, 10, 0.9, 0], [50, 50, 60, 60, 0.8, 1]], float)
    cm.process_batch(det, gt, gt_cls)
    assert cm.matrix[0, 0] == 1  # class0 matched
    assert cm.matrix[2, 1] == 1  # class1 gt missed
    assert cm.matrix[1, 2] == 1  # class1 det is FP


def test_match_predictions_device_equals_host():
    """The on-device matcher (argmax-chain) must reproduce the host
    sorted-unique heuristic on random inputs (validator SURVEY §2.9)."""
    import jax.numpy as jnp

    from edgeyolo_tpu.metrics.metrics import (
        match_predictions,
        match_predictions_device,
    )

    rng = np.random.RandomState(0)
    for trial in range(20):
        M, D = rng.randint(1, 12), rng.randint(1, 20)
        gt_cls = rng.randint(0, 3, M).astype(np.float32)
        pd_cls = rng.randint(0, 3, D).astype(np.float32)
        iou = rng.rand(M, D).astype(np.float32)
        host = match_predictions(pd_cls, gt_cls, iou * (gt_cls[:, None] == pd_cls[None, :]))
        dev = np.asarray(match_predictions_device(
            jnp.asarray(pd_cls), jnp.asarray(gt_cls),
            jnp.ones(M, bool), jnp.ones(D, bool), jnp.asarray(iou)))
        np.testing.assert_array_equal(dev, host, err_msg=f"trial {trial}")
    # padded/invalid slots never match
    dev = np.asarray(match_predictions_device(
        jnp.asarray([0.0, 1.0]), jnp.asarray([0.0, -1.0]),
        jnp.asarray([True, False]), jnp.asarray([True, False]),
        jnp.asarray([[0.9, 0.9], [0.9, 0.9]])))
    assert dev[0, 0] and not dev[1].any()
