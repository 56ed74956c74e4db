"""Box math, NMS and wavelet filter-bank unit tests."""

import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    box_iou,
    dist2bbox,
    make_anchors,
    xywh2xyxy,
    xyxy2xywh,
)
from edgeyolo_tpu.ops.nms import non_max_suppression
from edgeyolo_tpu.ops.wavelets import get_filter_bank


def test_xywh_roundtrip():
    b = jnp.asarray([[10.0, 20.0, 30.0, 40.0], [1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(xyxy2xywh(xywh2xyxy(b))), np.asarray(b), atol=1e-5)


def test_box_iou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    m = box_iou(a, a)
    np.testing.assert_allclose(np.asarray(jnp.diag(m)), 1.0, atol=1e-5)
    assert float(m[0, 1]) < 1e-6


def test_ciou_less_equal_iou():
    a = jnp.asarray([[5.0, 5.0, 4.0, 4.0]])
    b = jnp.asarray([[6.0, 6.0, 4.0, 4.0]])
    iou = bbox_iou(a, b, xywh=True).reshape(-1)
    ciou = bbox_iou(a, b, xywh=True, CIoU=True).reshape(-1)
    assert float(ciou[0]) <= float(iou[0]) + 1e-6


def test_make_anchors_counts_and_offsets():
    pts, strides = make_anchors([(4, 4), (2, 2)], [8, 16])
    assert pts.shape == (20, 2)
    assert float(pts[0, 0]) == 0.5
    assert float(strides[0, 0]) == 8.0 and float(strides[-1, 0]) == 16.0


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.asarray([[4.0, 4.0], [10.0, 10.0]])
    dist = jnp.asarray([[1.0, 2.0, 3.0, 2.5], [4.0, 4.0, 4.0, 4.0]])
    xyxy = dist2bbox(dist, anchors, xywh=False)
    back = bbox2dist(anchors, xyxy, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)


def _mk_pred(boxes_xywh, scores):
    """boxes (A,4) xywh, scores (A,nc) -> (1,A,4+nc)."""
    return jnp.concatenate([jnp.asarray(boxes_xywh), jnp.asarray(scores)], axis=-1)[None]


def test_nms_suppresses_overlap_keeps_distinct():
    boxes = [[50, 50, 20, 20], [51, 51, 20, 20], [150, 150, 20, 20]]
    scores = [[0.9], [0.8], [0.7]]
    det, n = non_max_suppression(_mk_pred(boxes, scores), conf_thres=0.1, iou_thres=0.5, max_det=10, max_nms=16)
    assert int(n[0]) == 2
    kept_conf = sorted(np.asarray(det[0, :2, 4]).tolist(), reverse=True)
    np.testing.assert_allclose(kept_conf, [0.9, 0.7], atol=1e-5)


def test_nms_class_aware():
    """Same location, different classes -> both kept (class-offset trick)."""
    boxes = [[50, 50, 20, 20], [50, 50, 20, 20]]
    scores = [[0.9, 0.0], [0.0, 0.8]]
    det, n = non_max_suppression(
        _mk_pred(boxes, scores), conf_thres=0.1, iou_thres=0.5, max_det=10, max_nms=16, multi_label=True
    )
    assert int(n[0]) == 2
    det, n = non_max_suppression(
        _mk_pred(boxes, scores), conf_thres=0.1, iou_thres=0.5, max_det=10, max_nms=16, multi_label=True, agnostic=True
    )
    assert int(n[0]) == 1


def test_nms_conf_gate():
    boxes = [[50, 50, 20, 20], [150, 150, 20, 20]]
    scores = [[0.9], [0.01]]
    det, n = non_max_suppression(_mk_pred(boxes, scores), conf_thres=0.25, iou_thres=0.5, max_det=10, max_nms=16)
    assert int(n[0]) == 1


def test_nms_output_is_xyxy():
    boxes = [[50, 50, 20, 20]]
    scores = [[0.9]]
    det, n = non_max_suppression(_mk_pred(boxes, scores), conf_thres=0.1, iou_thres=0.5, max_det=4, max_nms=8)
    np.testing.assert_allclose(np.asarray(det[0, 0, :4]), [40, 40, 60, 60], atol=1e-4)


def test_filter_banks_match_pywt_published_values():
    lo, hi, rlo, rhi = get_filter_bank("db2")
    np.testing.assert_allclose(
        lo, [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025], atol=1e-9
    )
    # SIGNS matter cross-framework (the reference builds DWT kernels from
    # pywt's dec_hi): pin pywt's published db2/haar high-pass values
    np.testing.assert_allclose(
        hi, [-0.48296291314469025, 0.836516303737469, -0.22414386804185735, -0.12940952255092145],
        atol=1e-9)
    np.testing.assert_allclose(
        rhi, [-0.12940952255092145, -0.22414386804185735, 0.836516303737469, -0.48296291314469025],
        atol=1e-9)
    lo_h, hi_h, _, rhi_h = get_filter_bank("haar")
    np.testing.assert_allclose(hi_h, [-(2**-0.5), 2**-0.5], atol=1e-12)
    np.testing.assert_allclose(rhi_h, [2**-0.5, -(2**-0.5)], atol=1e-12)
    for w in ("haar", "db2", "db3", "db4", "db8"):
        lo, hi, rlo, rhi = get_filter_bank(w)
        assert abs(float(np.sum(lo)) - np.sqrt(2)) < 1e-9  # DC gain
        assert abs(float(np.sum(lo**2)) - 1.0) < 1e-9  # orthonormal
        assert abs(float(np.sum(hi))) < 1e-9  # high-pass kills DC


def test_nms_matrix_matches_scan_on_long_suppression_chain():
    """Regression: the matrix fixed-point used to cap at 64 sweeps; a
    staircase of boxes each overlapping only its neighbor needs ~chain-length
    sweeps, so deep chains exited with stale suppression state. The bound is
    now the candidate count (sweep k finalizes the first k ranks)."""
    from edgeyolo_tpu.ops.nms import _greedy_nms_matrix, _greedy_nms_scan

    n, L, s = 200, 10.0, 2.0  # consecutive IoU 8/12 > 0.5; skip IoU 6/14 < 0.5
    x0 = np.arange(n, dtype=np.float32) * s
    boxes = jnp.asarray(np.stack([x0, np.zeros(n, np.float32), x0 + L,
                                  np.full(n, 5.0, np.float32)], 1))
    scores = jnp.asarray(np.linspace(1.0, 0.5, n, dtype=np.float32))  # sorted desc
    km, vm = _greedy_nms_matrix(boxes, scores, 0.5, n)
    ks, vs = _greedy_nms_scan(boxes, scores, 0.5, n)
    kept_m = sorted(np.asarray(km)[np.asarray(vm)].tolist())
    kept_s = sorted(np.asarray(ks)[np.asarray(vs)].tolist())
    assert kept_m == kept_s == list(range(0, n, 2))


def test_nms_classes_filter():
    """classes= keeps only the listed class ids (reference ops.py:254)."""
    boxes = [[50, 50, 20, 20], [150, 150, 20, 20], [250, 250, 20, 20]]
    scores = [[0.9, 0.0], [0.0, 0.8], [0.7, 0.0]]
    det, n = non_max_suppression(_mk_pred(boxes, scores), conf_thres=0.1,
                                 iou_thres=0.5, max_det=10, max_nms=16, classes=(1,))
    assert int(n[0]) == 1
    assert int(det[0, 0, 5]) == 1 and abs(float(det[0, 0, 4]) - 0.8) < 1e-5
    # multi-label path honors the same mask
    det, n = non_max_suppression(_mk_pred(boxes, scores), conf_thres=0.1,
                                 iou_thres=0.5, max_det=10, max_nms=16,
                                 multi_label=True, classes=(0,))
    assert int(n[0]) == 2
    assert set(np.asarray(det[0, :2, 5]).astype(int).tolist()) == {0}


def test_nms_rotated_classes_filter():
    from edgeyolo_tpu.ops.nms import nms_rotated

    pred = np.zeros((1, 3, 7), np.float32)  # xywh + 2 cls + angle
    pred[0, :, :4] = [[50, 50, 20, 10], [150, 150, 20, 10], [250, 250, 20, 10]]
    pred[0, 0, 4] = 0.9
    pred[0, 1, 5] = 0.8
    pred[0, 2, 4] = 0.7
    det, n = nms_rotated(jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5,
                         max_det=10, max_nms=8, classes=(0,))
    assert int(n[0]) == 2
    assert set(np.asarray(det[0, :2, 6]).astype(int).tolist()) == {0}


def test_nms_rotated_matches_reference_matrix_rule():
    """Pin the EXACT reference rotated-NMS semantics (ops.py:146-165 via
    non_max_suppression rotated=True): candidates = (anchor, class) pairs
    above conf when multi_label (the val setting), sorted by score; a
    candidate is suppressed when ANY higher-scored same-class candidate
    overlaps it above iou_thres — single pass, suppressed boxes still
    suppress (NOT greedy). Oracle below replicates that rule in numpy with
    the same probiou."""
    from edgeyolo_tpu.ops.boxes import probiou
    from edgeyolo_tpu.ops.nms import nms_rotated

    rng = np.random.RandomState(5)
    A, nc = 60, 3
    pred = np.zeros((1, A, 4 + nc + 1), np.float32)
    pred[0, :, 0:2] = rng.uniform(40, 120, (A, 2))  # clustered -> overlaps
    pred[0, :, 2:4] = rng.uniform(15, 50, (A, 2))
    pred[0, :, 4:4 + nc] = rng.uniform(0, 1, (A, nc)) ** 2
    pred[0, :, -1] = rng.uniform(-0.7, 0.7, A)

    for multi_label in (False, True):
        det, n = nms_rotated(jnp.asarray(pred), conf_thres=0.1, iou_thres=0.5,
                             max_det=64, max_nms=A * nc, multi_label=multi_label)
        n = int(n[0])
        got = np.asarray(det[0, :n])  # cx,cy,w,h,angle,conf,cls

        # numpy oracle
        if multi_label:
            ai, ci = np.nonzero(pred[0, :, 4:4 + nc] > 0.1)
            sc = pred[0, ai, 4 + ci]
        else:
            ci = pred[0, :, 4:4 + nc].argmax(-1)
            sc = pred[0, np.arange(A), 4 + ci]
            ai = np.nonzero(sc > 0.1)[0]
            sc, ci = sc[ai], ci[ai]
        order = np.argsort(-sc)
        ai, ci, sc = ai[order], ci[order], sc[order]
        rb = np.concatenate([pred[0, ai, :4], pred[0, ai, -1:]], 1)
        iou = np.asarray(probiou(jnp.asarray(rb)[:, None], jnp.asarray(rb)[None]))
        iou = iou.reshape(len(ai), len(ai))
        m = len(ai)
        higher = np.arange(m)[:, None] < np.arange(m)[None, :]
        sup = ((higher & (iou > 0.5) & (ci[:, None] == ci[None, :]))).max(0)
        keep = ~sup
        want = sorted(zip(np.round(sc[keep], 5), ci[keep], ai[keep]))
        have = sorted(zip(np.round(got[:, 5], 5), got[:, 6].astype(int),
                          [int(np.argmin(np.abs(pred[0, :, 0] - x))) for x in got[:, 0]]))
        assert len(want) == len(have), (multi_label, len(want), len(have))
        for (ws, wc, wa), (hs, hc, ha) in zip(want, have):
            assert abs(ws - hs) < 1e-4 and wc == hc, (multi_label, ws, wc, hs, hc)
