"""Tracking glue: wrap a Results stream with per-stream BYTETracker/BOTSORT.

Behavioral spec: ultralytics/trackers/track.py:18-104 (one tracker per
stream, update on postprocess, re-index results with track ids).
"""

from __future__ import annotations

import numpy as np

from edgeyolo_tpu.trackers.byte_tracker import BYTETracker
from edgeyolo_tpu.trackers.bot_sort import BOTSORT

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def make_tracker(cfg: str = "bytetrack", frame_rate: int = 30):
    name = str(cfg).replace(".yaml", "")
    if name not in TRACKER_MAP:
        raise ValueError(f"unknown tracker '{cfg}'; expected one of {sorted(TRACKER_MAP)}")
    return TRACKER_MAP[name](frame_rate=frame_rate)


def track_stream(results_iter, tracker_cfg: str = "bytetrack", persist: bool = False, frame_rate: int = 30):
    """Generator: annotate each Results with track ids (boxes gain id column
    semantics via filtering to tracked detections)."""
    tracker = make_tracker(tracker_cfg, frame_rate)
    for res in results_iter:
        if res.boxes is None or len(res.boxes) == 0:
            res.track_ids = np.zeros((0,), np.int64)
            yield res
            continue
        d = res.boxes.data
        tracks = tracker.update(d[:, :4], d[:, 4], d[:, 5])
        if len(tracks):
            idx = tracks[:, 7].astype(int)
            res = res[idx]
            res.track_ids = tracks[:, 4].astype(np.int64)
            res.boxes_tracked = tracks[:, :7]
        else:
            res = res[np.zeros((0,), int)]
            res.track_ids = np.zeros((0,), np.int64)
        yield res
