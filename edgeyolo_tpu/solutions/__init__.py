"""Turnkey applications (reference ultralytics/solutions surface)."""

from edgeyolo_tpu.solutions.plots import YOLOCompleteVisualizer
from edgeyolo_tpu.solutions.solutions import (
    AIGym,
    Analytics,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    ObjectCounter,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    SpeedEstimator,
    TrackZone,
)

__all__ = [n for n in dir() if not n.startswith("_")]
