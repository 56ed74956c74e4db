"""Turnkey vision applications over model.track() streams.

Behavioral spec: ultralytics/solutions/*.py (SURVEY.md §2.10: region counting,
heatmaps, speed estimation, queue management, trackzone, distance, AI gym,
analytics, parking, security alarm — all thin consumers of tracked Results).
Host-side numpy on top of the device detection/tracking pipeline.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER


def _point_in_polygon(pt, poly) -> bool:
    x, y = pt
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1:
            inside = not inside
    return inside


def _side_of_line(pt, a, b) -> float:
    return (b[0] - a[0]) * (pt[1] - a[1]) - (b[1] - a[1]) * (pt[0] - a[0])


class BaseSolution:
    """Shared plumbing: consume a tracked Results stream, keep per-track state."""

    def __init__(self, region=None, classes=None, verbose: bool = True):
        self.region = [tuple(p) for p in (region or [])]
        self.classes = set(classes) if classes else None
        self.verbose = verbose
        self.track_history: dict[int, list] = defaultdict(list)

    def _centers(self, res):
        """(track_id, class, center, box) for each tracked det in a Results."""
        out = []
        ids = getattr(res, "track_ids", None)
        if res.boxes is None or ids is None:
            return out
        # layout-safe accessors: tracked Boxes are (N, 7) with the id at
        # column 4, so cls/conf positions shift vs plain (N, 6) data
        for tid, b, c in zip(ids, res.boxes.xyxy, res.boxes.cls):
            c = int(c)
            if self.classes and c not in self.classes:
                continue
            center = ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
            self.track_history[int(tid)].append(center)
            if len(self.track_history[int(tid)]) > 30:
                self.track_history[int(tid)].pop(0)
            out.append((int(tid), c, center, b[:4]))
        return out

    def __call__(self, results_stream):
        for res in results_stream:
            self.process(res)
            yield res

    def process(self, res):  # override
        raise NotImplementedError


class ObjectCounter(BaseSolution):
    """Line/region crossing counter with in/out direction (solutions/object_counter)."""

    def __init__(self, region, **kw):
        super().__init__(region, **kw)
        self.in_count = 0
        self.out_count = 0
        self.counted: set[int] = set()
        self._last_side: dict[int, float] = {}

    def process(self, res):
        for tid, c, center, box in self._centers(res):
            hist = self.track_history[tid]
            if tid in self.counted or len(hist) < 2:
                if len(self.region) == 2 and hist:
                    s = _side_of_line(hist[-1], self.region[0], self.region[1])
                    if s != 0:
                        self._last_side.setdefault(tid, s)
                continue
            prev, cur = hist[-2], hist[-1]
            if len(self.region) == 2:  # line crossing (track last nonzero side)
                s1 = _side_of_line(cur, self.region[0], self.region[1])
                s0 = self._last_side.get(tid, _side_of_line(prev, self.region[0], self.region[1]))
                if s1 != 0 and s0 != 0 and (s0 > 0) != (s1 > 0):
                    if s1 > 0:
                        self.in_count += 1
                    else:
                        self.out_count += 1
                    self.counted.add(tid)
                if s1 != 0:
                    self._last_side[tid] = s1
            elif len(self.region) > 2:  # polygon entry
                was_in = _point_in_polygon(prev, self.region)
                is_in = _point_in_polygon(cur, self.region)
                if not was_in and is_in:
                    self.in_count += 1
                    self.counted.add(tid)
                elif was_in and not is_in:
                    self.out_count += 1
                    self.counted.add(tid)

    @property
    def counts(self):
        return {"in": self.in_count, "out": self.out_count}


class RegionCounter(BaseSolution):
    """Live per-region occupancy counts (solutions/region_counter)."""

    def __init__(self, regions: dict, **kw):
        super().__init__(None, **kw)
        self.regions = {name: [tuple(p) for p in poly] for name, poly in regions.items()}
        self.region_counts = {name: 0 for name in regions}

    def process(self, res):
        self.region_counts = {name: 0 for name in self.regions}
        for tid, c, center, box in self._centers(res):
            for name, poly in self.regions.items():
                if _point_in_polygon(center, poly):
                    self.region_counts[name] += 1


class Heatmap(BaseSolution):
    """Accumulated presence heatmap (solutions/heatmap)."""

    def __init__(self, shape=(640, 640), **kw):
        super().__init__(None, **kw)
        self.heat = np.zeros(shape, np.float32)

    def process(self, res):
        h, w = self.heat.shape
        for tid, c, center, box in self._centers(res):
            x1, y1, x2, y2 = [int(v) for v in box]
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(w, x2), min(h, y2)
            if x2 > x1 and y2 > y1:
                self.heat[y1:y2, x1:x2] += 1.0

    def normalized(self):
        m = self.heat.max()
        return self.heat / m if m > 0 else self.heat


class SpeedEstimator(BaseSolution):
    """Pixel-displacement speed estimate per track (solutions/speed_estimation)."""

    def __init__(self, fps: float = 30.0, meters_per_pixel: float = 0.05, **kw):
        super().__init__(None, **kw)
        self.fps = fps
        self.mpp = meters_per_pixel
        self.speeds: dict[int, float] = {}

    def process(self, res):
        for tid, c, center, box in self._centers(res):
            hist = self.track_history[tid]
            if len(hist) >= 2:
                d = np.hypot(hist[-1][0] - hist[-2][0], hist[-1][1] - hist[-2][1])
                self.speeds[tid] = d * self.mpp * self.fps * 3.6  # km/h


class QueueManager(BaseSolution):
    """Queue length inside a region (solutions/queue_management)."""

    def __init__(self, region, **kw):
        super().__init__(region, **kw)
        self.queue_count = 0

    def process(self, res):
        self.queue_count = sum(
            1 for tid, c, center, box in self._centers(res) if _point_in_polygon(center, self.region)
        )


class TrackZone(BaseSolution):
    """Restrict tracking focus to a zone; collects ids inside (solutions/trackzone)."""

    def __init__(self, region, **kw):
        super().__init__(region, **kw)
        self.zone_ids: set[int] = set()

    def process(self, res):
        self.zone_ids = {
            tid for tid, c, center, box in self._centers(res) if _point_in_polygon(center, self.region)
        }


class DistanceCalculation(BaseSolution):
    """Pixel/metric distance between two selected track ids (solutions/distance_calculation)."""

    def __init__(self, id_a: int, id_b: int, meters_per_pixel: float = 0.05, **kw):
        super().__init__(None, **kw)
        self.id_a, self.id_b = id_a, id_b
        self.mpp = meters_per_pixel
        self.distance_m = None

    def process(self, res):
        pts = {tid: center for tid, c, center, box in self._centers(res)}
        if self.id_a in pts and self.id_b in pts:
            a, b = pts[self.id_a], pts[self.id_b]
            self.distance_m = float(np.hypot(a[0] - b[0], a[1] - b[1]) * self.mpp)


class AIGym(BaseSolution):
    """Exercise rep counting from pose keypoints (solutions/ai_gym).

    kpts_per_frame: (K, >=2) keypoint array; angle computed over a joint
    triple (default elbow: shoulder-elbow-wrist indices 5, 7, 9).
    """

    def __init__(self, joints=(5, 7, 9), up_angle: float = 145.0, down_angle: float = 90.0, **kw):
        super().__init__(None, **kw)
        self.joints = joints
        self.up_angle, self.down_angle = up_angle, down_angle
        self.count = 0
        self.stage = "up"
        # stream state: per-person counters keyed by track id (reference
        # ai_gym.py keeps parallel count/angle/stage lists per track)
        self.counts: dict[int, int] = {}
        self.stages: dict[int, str] = {}

    @staticmethod
    def angle(a, b, c) -> float:
        ba = np.asarray(a) - np.asarray(b)
        bc = np.asarray(c) - np.asarray(b)
        cos = np.dot(ba, bc) / (np.linalg.norm(ba) * np.linalg.norm(bc) + 1e-9)
        return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))

    def update(self, kpts_per_frame: np.ndarray):
        i, j, k = self.joints
        ang = self.angle(kpts_per_frame[i, :2], kpts_per_frame[j, :2], kpts_per_frame[k, :2])
        if ang < self.down_angle and self.stage == "up":
            self.stage = "down"
        elif ang > self.up_angle and self.stage == "down":
            self.stage = "up"
            self.count += 1
        return self.count

    def process(self, res):
        """Stream interface (reference ai_gym.monitor): per-person rep
        counting from a pose Result's keypoints, keyed by track id when
        tracking is active, else by detection index."""
        kp = getattr(res, "keypoints", None)
        if kp is None or len(kp) == 0:
            return
        data = np.asarray(kp.data)  # (N, K, 2|3)
        ids = None
        if res.boxes is not None and getattr(res.boxes, "id", None) is not None:
            ids = np.asarray(res.boxes.id).astype(int)
        i, j, k = self.joints
        for n in range(data.shape[0]):
            pid = int(ids[n]) if ids is not None and n < len(ids) else n
            ang = self.angle(data[n, i, :2], data[n, j, :2], data[n, k, :2])
            stage = self.stages.get(pid, "up")
            if ang < self.down_angle and stage == "up":
                self.stages[pid] = "down"
            elif ang > self.up_angle and stage == "down":
                self.stages[pid] = "up"
                self.counts[pid] = self.counts.get(pid, 0) + 1

    @property
    def total_count(self) -> int:
        """Stream-path reps across all tracked people (+ the explicit
        update() counter when that API was used)."""
        return sum(self.counts.values()) + self.count


class Analytics(BaseSolution):
    """Per-frame class-count time series + chart (solutions/analytics)."""

    def __init__(self, names: dict | None = None, **kw):
        super().__init__(None, **kw)
        self.names = names or {}
        self.series: list[dict] = []

    def process(self, res):
        counts: dict[int, int] = defaultdict(int)
        if res.boxes is not None:
            for c in res.boxes.cls:
                counts[int(c)] += 1
        self.series.append(dict(counts))

    def plot(self, path: str | Path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        classes = sorted({c for s in self.series for c in s})
        fig, ax = plt.subplots(figsize=(8, 4), tight_layout=True)
        for c in classes:
            ax.plot([s.get(c, 0) for s in self.series], label=self.names.get(c, str(c)))
        ax.set_xlabel("frame")
        ax.set_ylabel("count")
        ax.legend(fontsize=8)
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return str(path)


class SecurityAlarm(BaseSolution):
    """Threshold-triggered alert hook (solutions/security_alarm; email send is
    a user-provided callback — no SMTP in this environment)."""

    def __init__(self, threshold: int = 1, on_alarm=None, **kw):
        super().__init__(None, **kw)
        self.threshold = threshold
        self.on_alarm = on_alarm or (lambda n: LOGGER.warning(f"SECURITY ALARM: {n} objects detected"))
        self.triggered = False

    def process(self, res):
        n = len(res.boxes) if res.boxes is not None else 0
        if n >= self.threshold and not self.triggered:
            self.triggered = True
            self.on_alarm(n)


class ParkingManagement(RegionCounter):
    """Occupancy of parking-slot polygons (solutions/parking_management)."""

    @property
    def occupancy(self):
        return {name: c > 0 for name, c in self.region_counts.items()}


class ParkingPtsSelection:
    """Parking-zone point picker (reference solutions/parking_management.py:14
    ParkingPtsSelection — tkinter UI to click 4-point regions on an image and
    save them to bounding_boxes.json).

    tkinter IS importable in this image, but a display usually is not, so the
    point/box state machine and the JSON format live UI-free on this class
    (headless-testable); `launch()` builds the actual Tk window and binds
    clicks, raising a clean error when no display is available.
    """

    def __init__(self):
        self.rg_data: list[list[tuple[int, int]]] = []  # finished 4-pt boxes
        self.current_box: list[tuple[int, int]] = []
        self.imgw = self.imgh = 0
        self.canvas_w = self.canvas_h = 1

    # -- UI-free core (reference on_canvas_click / remove_last / save) -------
    def add_point(self, x: int, y: int) -> bool:
        """Add one click; returns True when it completes a 4-point box."""
        self.current_box.append((int(x), int(y)))
        if len(self.current_box) == 4:
            self.rg_data.append(self.current_box.copy())
            self.current_box.clear()
            return True
        return False

    def remove_last_bounding_box(self):
        if self.rg_data:
            self.rg_data.pop()

    def to_json(self):
        """Canvas -> image coordinate scaling + the reference's JSON schema
        ([{"points": [(x, y) x4]}] — parking_management.py save_to_json)."""
        sw = self.imgw / max(self.canvas_w, 1)
        sh = self.imgh / max(self.canvas_h, 1)
        return [{"points": [(int(x * sw), int(y * sh)) for x, y in box]}
                for box in self.rg_data]

    def save_to_json(self, path="bounding_boxes.json"):
        import json as _json

        Path(path).write_text(_json.dumps(self.to_json(), indent=4))
        return path

    # -- Tk shell ------------------------------------------------------------
    def launch(self, image_path=None, canvas_max=(1280, 720)):
        """Open the Tk picker window (requires a display)."""
        import tkinter as tk
        from tkinter import filedialog, messagebox

        try:
            master = tk.Tk()
        except tk.TclError as e:
            raise RuntimeError(f"no display available for the Tk picker: {e}") from e
        from PIL import Image, ImageTk

        master.title("Parking Zones Points Selector")
        canvas = tk.Canvas(master, bg="white")
        canvas.pack(side=tk.BOTTOM)

        def upload(path=None):
            path = path or filedialog.askopenfilename()
            img = Image.open(path)
            self.imgw, self.imgh = img.size
            ar = self.imgw / self.imgh
            cw = min(canvas_max[0], self.imgw) if ar > 1 else int(canvas_max[1] * ar)
            ch = int(cw / ar)
            self.canvas_w, self.canvas_h = cw, ch
            canvas.config(width=cw, height=ch)
            self._tkimg = ImageTk.PhotoImage(img.resize((cw, ch)))
            canvas.create_image(0, 0, image=self._tkimg, anchor="nw")

        def on_click(ev):
            canvas.create_oval(ev.x - 3, ev.y - 3, ev.x + 3, ev.y + 3, fill="red")
            if self.add_point(ev.x, ev.y):
                box = self.rg_data[-1]
                for i in range(4):
                    canvas.create_line(box[i], box[(i + 1) % 4], fill="blue", width=2)

        canvas.bind("<Button-1>", on_click)
        frame = tk.Frame(master)
        frame.pack(side=tk.TOP)
        tk.Button(frame, text="Upload Image", command=upload).pack(side=tk.LEFT)
        tk.Button(frame, text="Remove Last Box",
                  command=self.remove_last_bounding_box).pack(side=tk.LEFT)
        tk.Button(frame, text="Save",
                  command=lambda: (self.save_to_json(),
                                   messagebox.showinfo("Success", "saved"))).pack(side=tk.LEFT)
        if image_path:
            upload(image_path)
        master.mainloop()
