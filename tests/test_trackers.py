"""Tracker tests: Kalman sanity + ByteTrack identity persistence on synthetic motion."""

import numpy as np

from edgeyolo_tpu.trackers.byte_tracker import BYTETracker
from edgeyolo_tpu.trackers.bot_sort import BOTSORT
from edgeyolo_tpu.trackers.kalman import KalmanFilterXYAH


def test_kalman_predict_update_converges():
    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.array([50.0, 50.0, 1.0, 20.0]))
    for t in range(1, 10):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([50.0 + 2 * t, 50.0, 1.0, 20.0]))
    assert abs(mean[4] - 2.0) < 0.8  # learned x-velocity ~2 px/frame
    assert abs(mean[1] - 50.0) < 1.0


def _moving_dets(t):
    """Two objects moving right/down."""
    return (
        np.array([
            [10 + 3 * t, 10, 30 + 3 * t, 30],
            [100, 50 + 2 * t, 130, 90 + 2 * t],
        ], np.float32),
        np.array([0.9, 0.85], np.float32),
        np.array([0.0, 1.0], np.float32),
    )


def test_bytetrack_id_persistence():
    tr = BYTETracker()
    ids_per_frame = []
    for t in range(10):
        boxes, scores, clss = _moving_dets(t)
        out = tr.update(boxes, scores, clss)
        if t >= 1:
            assert out.shape[0] == 2
            ids_per_frame.append(tuple(sorted(out[:, 4].astype(int))))
    assert len(set(ids_per_frame)) == 1  # same two ids throughout


def test_bytetrack_handles_dropout_frame():
    tr = BYTETracker(track_buffer=30)
    for t in range(5):
        boxes, scores, clss = _moving_dets(t)
        out = tr.update(boxes, scores, clss)
    ids_before = set(out[:, 4].astype(int))
    # object 0 disappears for 2 frames
    for t in range(5, 7):
        boxes, scores, clss = _moving_dets(t)
        out = tr.update(boxes[1:], scores[1:], clss[1:])
    # reappears -> same id (re-activation from lost pool)
    boxes, scores, clss = _moving_dets(7)
    out = tr.update(boxes, scores, clss)
    assert set(out[:, 4].astype(int)) == ids_before


def test_bytetrack_low_conf_second_association():
    tr = BYTETracker()
    for t in range(3):
        boxes, scores, clss = _moving_dets(t)
        tr.update(boxes, scores, clss)
    # conf drops below high threshold but above low -> still tracked via stage 2
    boxes, scores, clss = _moving_dets(3)
    out = tr.update(boxes, np.array([0.15, 0.9], np.float32), clss)
    assert out.shape[0] == 2


def test_botsort_runs():
    tr = BOTSORT()
    for t in range(5):
        boxes, scores, clss = _moving_dets(t)
        out = tr.update(boxes, scores, clss)
    assert out.shape[0] == 2 and out.shape[1] == 8
