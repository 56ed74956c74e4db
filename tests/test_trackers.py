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


def test_gmc_estimates_translation():
    """Synthetic camera pan: GMC recovers the global shift (reference
    gmc.py:11 sparseOptFlow semantics, numpy implementation)."""
    import numpy as np

    from edgeyolo_tpu.trackers.gmc import GMC

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (200, 260, 3)).astype(np.uint8)
    # smooth to make gradients informative
    base = base.astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5
    base = base.astype(np.uint8)
    dx, dy = 6, -4
    shifted = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
    g = GMC("sparseOptFlow", downscale=2)
    H0 = g.apply(base)
    np.testing.assert_allclose(H0, np.eye(2, 3), atol=1e-6)  # first frame
    H = g.apply(shifted)
    # points move by (+dx, +dy) from prev to cur
    assert abs(H[0, 2] - dx) < 1.5, H
    assert abs(H[1, 2] - dy) < 1.5, H
    assert abs(H[0, 0] - 1) < 0.05 and abs(H[1, 0]) < 0.05  # ~pure translation


def test_gmc_none_method_identity():
    import numpy as np

    from edgeyolo_tpu.trackers.gmc import GMC

    g = GMC("none")
    H = g.apply(np.zeros((64, 64, 3), np.uint8))
    np.testing.assert_allclose(H, np.eye(2, 3))


def test_make_tracker_reads_yaml():
    from edgeyolo_tpu.trackers.bot_sort import BOTSORT
    from edgeyolo_tpu.trackers.byte_tracker import BYTETracker
    from edgeyolo_tpu.trackers.track import make_tracker

    t1 = make_tracker("bytetrack.yaml")
    assert isinstance(t1, BYTETracker) and not isinstance(t1, BOTSORT)
    assert t1.track_high_thresh == 0.25 and t1.match_thresh == 0.8
    t2 = make_tracker("botsort.yaml")
    assert isinstance(t2, BOTSORT)
    assert t2.gmc is not None and t2.proximity_thresh == 0.5


def test_botsort_gmc_compensates_pan(tmp_path):
    """A static object under camera pan keeps its track id with GMC."""
    import numpy as np

    from edgeyolo_tpu.trackers.track import make_tracker

    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (160, 240, 3)).astype(np.float32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5
    tracker = make_tracker("botsort.yaml")
    box = np.array([40.0, 40.0, 80.0, 80.0])
    ids = []
    for f in range(5):
        shift = 8 * f
        frame = np.roll(base, shift, axis=1).astype(np.uint8)
        b = box + np.array([shift, 0, shift, 0])
        out = tracker.update(b[None], np.array([0.9]), np.array([0.0]), img=frame)
        if len(out):
            ids.append(int(out[0, 4]))
    assert len(set(ids)) == 1 and len(ids) >= 4


def test_botsort_update_dispatches_botrack_multi_predict(monkeypatch):
    """BOTSORT tracks carry XYWH Kalman state; the update loop must predict
    through BOTrack.multi_predict (XYWH shared filter), not the base
    STrack (XYAH) one."""
    from edgeyolo_tpu.trackers.bot_sort import BOTSORT, BOTrack

    called = {"n": 0}
    orig = BOTrack.multi_predict  # staticmethod -> plain function from class

    def spy(stracks):
        called["n"] += 1
        return orig(stracks)

    monkeypatch.setattr(BOTrack, "multi_predict", staticmethod(spy))
    bot = BOTSORT()
    det = np.asarray([[10.0, 10.0, 50.0, 50.0]], np.float32)
    for f in range(3):
        bot.update(det + f, np.asarray([0.9], np.float32), np.asarray([0.0], np.float32))
    assert called["n"] >= 2  # predict ran through the BOTrack filter each frame
