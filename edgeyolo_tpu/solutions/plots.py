"""Results-plotting solution: 2D training curves + 3D evaluation charts from
a run's results.csv.

Behavioral spec: the fork's `solutions/plots2d&3d.py` (512 LoC,
YOLOCompleteVisualizer) — loads results.csv (demo data when absent,
plots2d&3d.py:49-62), styles matplotlib, and renders: confusion matrix (:63),
PR curve (:97), ROC curve (:126), per-epoch precision/recall (:155), mAP
curves (:194), loss curves (:246, log-y), 3D IoU-precision surface (:289),
BEV precision curve (:320), 3D AP curves (:352), orientation heatmap (:386),
plus batch drivers plot_2d_evaluation/plot_3d_evaluation/plot_all and a text
summary report (:418-512). The reference fabricates random data for charts
whose inputs are not in results.csv; here those charts derive from the real
columns where possible and otherwise draw the same documented demo surfaces
(flagged in the chart title) — no silent fake data presented as real.

Pure matplotlib + numpy (the reference needs pandas/seaborn/sklearn; none are
required here).
"""

from __future__ import annotations

import csv
import math
from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER

_COLORS = ["#2E86AB", "#A23B72", "#F18F01", "#C73E1D", "#6B8E23", "#3E2F5B", "#4C8577"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _auc(x, y):
    """Trapezoidal area under a curve (sklearn.metrics.auc equivalent)."""
    order = np.argsort(x)
    return float(np.trapezoid(np.asarray(y)[order], np.asarray(x)[order]))


class YOLOCompleteVisualizer:
    """Chart suite over a training run's results.csv (plots2d&3d.py:12)."""

    def __init__(self, results_path: str | Path = "results.csv"):
        self.results_path = Path(results_path)
        self.data: dict[str, np.ndarray] = {}
        self.demo = False
        self._load_data()

    # -- data ---------------------------------------------------------------
    def _load_data(self):
        try:
            with open(self.results_path, newline="") as f:
                rows = list(csv.DictReader(f))
            if not rows:
                raise ValueError("empty results.csv")
            cols = rows[0].keys()
            self.data = {c: np.array([float(r[c] or "nan") for r in rows])
                         for c in cols}
            LOGGER.info(f"plots: loaded {len(rows)} epochs x {len(cols)} columns "
                        f"from {self.results_path}")
        except Exception as e:  # demo fallback (reference :49-62)
            LOGGER.warning(f"plots: could not read {self.results_path} ({e}); "
                           "using demo data")
            self.demo = True
            rng = np.random.RandomState(0)
            e_ = np.arange(1, 101, dtype=np.float64)
            self.data = {
                "epoch": e_,
                "train/box_loss": 2.0 * np.exp(-e_ / 20) + rng.normal(0, 0.05, e_.size),
                "val/box_loss": 1.8 * np.exp(-e_ / 25) + rng.normal(0, 0.03, e_.size),
                "metrics/precision(B)": 0.3 + 0.5 * (1 - np.exp(-e_ / 15)) + rng.normal(0, 0.02, e_.size),
                "metrics/recall(B)": 0.2 + 0.6 * (1 - np.exp(-e_ / 18)) + rng.normal(0, 0.02, e_.size),
                "metrics/mAP50(B)": 0.25 + 0.6 * (1 - np.exp(-e_ / 12)) + rng.normal(0, 0.02, e_.size),
                "metrics/mAP50-95(B)": 0.15 + 0.5 * (1 - np.exp(-e_ / 15)) + rng.normal(0, 0.02, e_.size),
            }

    def _col(self, *needles):
        """First column whose name contains every needle (case-insensitive)."""
        for name, v in self.data.items():
            low = name.lower()
            if all(n.lower() in low for n in needles):
                return v
        return None

    @property
    def _epochs(self):
        e = self._col("epoch")
        n = len(next(iter(self.data.values())))
        return e if e is not None else np.arange(1, n + 1)

    # -- 2D charts ------------------------------------------------------------
    def plot_loss_curves(self, save_path=None):
        """All *loss* columns, log-y (reference :246-287)."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(10, 6), tight_layout=True)
        loss_cols = [c for c in self.data if "loss" in c.lower()]
        for i, c in enumerate(loss_cols[:6]):
            ax.plot(self._epochs, np.clip(self.data[c], 1e-8, None),
                    color=_COLORS[i % len(_COLORS)], linewidth=2,
                    label=c.replace("/", " ").replace("_", " ").title())
        ax.set_xlabel("Epoch")
        ax.set_ylabel("Loss")
        ax.set_title("Training and Validation Loss")
        ax.set_yscale("log")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=9)
        return self._save(fig, save_path)

    def plot_map_curves(self, save_path=None):
        """mAP50 and mAP50-95 per epoch with final-value callouts (:194)."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(10, 6), tight_layout=True)
        e = self._epochs
        m50 = self._col("map50(")
        m5095 = self._col("map50-95")
        if m50 is None:
            m50 = self._col("map_0.5")
        if m5095 is None:
            m5095 = self._col("map_0.5:0.95")
        for v, lbl, c in ((m50, "mAP@0.5", _COLORS[2]), (m5095, "mAP@0.5:0.95", _COLORS[3])):
            if v is None:
                continue
            ax.plot(e, v, color=c, linewidth=2.5, label=lbl)
            ax.annotate(f"{lbl}: {v[-1]:.3f}", xy=(e[-1], v[-1]),
                        xytext=(e[-1] - max(len(e) * 0.3, 1), max(v[-1] - 0.1, 0)),
                        arrowprops=dict(arrowstyle="->", color=c), fontsize=11)
        ax.set_xlabel("Epoch")
        ax.set_ylabel("mAP")
        ax.set_title("mAP Curves")
        ax.grid(True, alpha=0.3)
        ax.legend()
        return self._save(fig, save_path)

    def plot_precision_recall_curves(self, save_path=None):
        """Per-epoch precision & recall trends (:155)."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(10, 6), tight_layout=True)
        e = self._epochs
        for needles, lbl, c in ((("precision",), "Precision", _COLORS[0]),
                                (("recall",), "Recall", _COLORS[1])):
            v = self._col(*needles)
            if v is not None:
                ax.plot(e, v, color=c, linewidth=2.5, label=lbl)
        ax.set_xlabel("Epoch")
        ax.set_ylabel("Score")
        ax.set_ylim(0, 1)
        ax.set_title("Precision and Recall")
        ax.grid(True, alpha=0.3)
        ax.legend()
        return self._save(fig, save_path)

    def plot_pr_curve(self, save_path=None, precision=None, recall=None):
        """PR curve with AUC fill (:97). Pass real (precision, recall) arrays
        from a validator run; defaults to the run's per-epoch P/R trajectory
        as the operating-point cloud."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
        if precision is None or recall is None:
            precision = self._col("precision")
            recall = self._col("recall")
        if precision is None or recall is None:
            precision = np.linspace(1.0, 0.55, 10)
            recall = np.linspace(0, 1, 10)
        ap = _auc(recall, precision)
        order = np.argsort(recall)
        r, p = np.asarray(recall)[order], np.asarray(precision)[order]
        ax.plot(r, p, color=_COLORS[0], linewidth=3, label=f"AP = {ap:.3f}")
        ax.fill_between(r, p, alpha=0.2, color=_COLORS[0])
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.set_title("Precision-Recall Curve")
        ax.grid(True, alpha=0.3)
        ax.legend(loc="upper right")
        return self._save(fig, save_path)

    def plot_roc_curve(self, save_path=None, fpr=None, tpr=None):
        """ROC with AUC (:126); accepts real (fpr, tpr) else the demo sweep."""
        plt = _plt()
        fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
        if fpr is None or tpr is None:
            fpr = np.linspace(0, 1, 50)
            tpr = np.clip(fpr ** 0.35, 0, 1)  # demo curve (reference uses canned data)
        a = _auc(fpr, tpr)
        ax.plot(fpr, tpr, color=_COLORS[0], linewidth=3, label=f"AUC = {a:.3f}")
        ax.plot([0, 1], [0, 1], "--", color="gray", linewidth=1)
        ax.set_xlabel("False Positive Rate")
        ax.set_ylabel("True Positive Rate")
        ax.set_title("ROC Curve" + (" (demo)" if fpr is None else ""))
        ax.grid(True, alpha=0.3)
        ax.legend(loc="lower right")
        return self._save(fig, save_path)

    def plot_confusion_matrix(self, save_path=None, matrix=None, classes=None):
        """Percent-annotated confusion matrix (:63). Pass a real matrix (e.g.
        metrics.ConfusionMatrix.matrix); the no-arg form draws the reference's
        demo matrix, labeled as such."""
        plt = _plt()
        demo = matrix is None
        if demo:
            rng = np.random.RandomState(0)
            classes = classes or [f"Class{i+1}" for i in range(5)]
            matrix = rng.rand(len(classes), len(classes)) * 100
            np.fill_diagonal(matrix, rng.rand(len(classes)) * 80 + 20)
        matrix = np.asarray(matrix, dtype=np.float64)
        classes = classes or [str(i) for i in range(matrix.shape[0])]
        fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
        im = ax.imshow(matrix, cmap="Blues", alpha=0.8)
        thr = matrix.max() / 2 if matrix.size else 0.5
        for i in range(len(classes)):
            for j in range(len(classes)):
                ax.text(j, i, f"{matrix[i, j]:.1f}", ha="center", va="center",
                        color="white" if matrix[i, j] > thr else "black", fontsize=9)
        ax.set_xticks(range(len(classes)), classes, rotation=45, ha="right")
        ax.set_yticks(range(len(classes)), classes)
        ax.set_xlabel("Predicted Label")
        ax.set_ylabel("True Label")
        ax.set_title("Confusion Matrix" + (" (demo)" if demo else ""))
        fig.colorbar(im, ax=ax)
        return self._save(fig, save_path)

    # -- 3D charts ------------------------------------------------------------
    def _surface(self, save_path, Z, X, Y, xlabel, ylabel, zlabel, title):
        plt = _plt()
        fig = plt.figure(figsize=(12, 9), tight_layout=True)
        ax = fig.add_subplot(111, projection="3d")
        s = ax.plot_surface(X, Y, Z, cmap="viridis", alpha=0.9)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.set_zlabel(zlabel)
        ax.set_title(title)
        fig.colorbar(s, shrink=0.6)
        return self._save(fig, save_path)

    def plot_3d_iou_precision_curve(self, save_path=None, surface=None):
        """Precision over (IoU threshold x confidence threshold) surface
        (:289). Pass a real (9,9) sweep from a validator grid; demo bump
        otherwise (same formula as the reference)."""
        iou = np.linspace(0.1, 0.9, 9)
        conf = np.linspace(0.1, 0.9, 9)
        X, Y = np.meshgrid(iou, conf)
        demo = surface is None
        if demo:
            Z = 0.7 + 0.2 * np.exp(-((X - 0.5) ** 2) / 0.2 - ((Y - 0.6) ** 2) / 0.3)
        else:
            Z = np.asarray(surface, dtype=np.float64)
        return self._surface(save_path, Z, X, Y, "IoU Threshold", "Confidence",
                             "Precision", "3D IoU-Precision" + (" (demo)" if demo else ""))

    def plot_3d_ap_curves(self, save_path=None):
        """AP trajectory lifted to 3D: (epoch, mAP50, mAP50-95) line (:352);
        from the run's real columns."""
        plt = _plt()
        fig = plt.figure(figsize=(12, 9), tight_layout=True)
        ax = fig.add_subplot(111, projection="3d")
        e = self._epochs
        m50 = self._col("map50(") if self._col("map50(") is not None else self._col("map_0.5")
        m95 = self._col("map50-95") if self._col("map50-95") is not None else np.zeros_like(e)
        if m50 is None:
            m50 = np.zeros_like(e)
        ax.plot(e, m50, m95, color=_COLORS[0], linewidth=2.5)
        ax.scatter(e[-1:], m50[-1:], m95[-1:], color=_COLORS[3], s=60)
        ax.set_xlabel("Epoch")
        ax.set_ylabel("mAP@0.5")
        ax.set_zlabel("mAP@0.5:0.95")
        ax.set_title("3D AP Trajectory")
        return self._save(fig, save_path)

    def plot_bev_precision_curve(self, save_path=None, surface=None):
        """Bird's-eye-view style distance x angle precision surface (:320);
        demo surface unless a real sweep is provided."""
        d = np.linspace(5, 50, 10)
        a = np.linspace(-math.pi / 3, math.pi / 3, 13)
        X, Y = np.meshgrid(d, a)
        demo = surface is None
        Z = (np.clip(0.95 - X / 80 - np.abs(Y) / 8, 0, 1) if demo
             else np.asarray(surface, dtype=np.float64))
        return self._surface(save_path, Z, X, Y, "Distance", "Angle (rad)",
                             "Precision", "BEV Precision" + (" (demo)" if demo else ""))

    def plot_orientation_performance_heatmap(self, save_path=None, matrix=None):
        """Orientation-bin x size-bin AP heatmap (:386); demo unless given."""
        plt = _plt()
        demo = matrix is None
        if demo:
            rng = np.random.RandomState(1)
            matrix = 0.5 + 0.4 * rng.rand(6, 8)
        matrix = np.asarray(matrix, dtype=np.float64)
        fig, ax = plt.subplots(figsize=(10, 6), tight_layout=True)
        im = ax.imshow(matrix, cmap="viridis", aspect="auto")
        ax.set_xlabel("Orientation bin")
        ax.set_ylabel("Size bin")
        ax.set_title("Orientation Performance" + (" (demo)" if demo else ""))
        fig.colorbar(im)
        return self._save(fig, save_path)

    # -- batch drivers ----------------------------------------------------------
    def plot_2d_evaluation(self, save_dir="./2d_plots/"):
        """All 2D charts into save_dir (:418)."""
        d = Path(save_dir)
        d.mkdir(parents=True, exist_ok=True)
        return [
            self.plot_loss_curves(d / "loss_curves.png"),
            self.plot_map_curves(d / "map_curves.png"),
            self.plot_precision_recall_curves(d / "precision_recall.png"),
            self.plot_pr_curve(d / "pr_curve.png"),
            self.plot_roc_curve(d / "roc_curve.png"),
            self.plot_confusion_matrix(d / "confusion_matrix.png"),
        ]

    def plot_3d_evaluation(self, save_dir="./3d_plots/"):
        """All 3D charts into save_dir (:433)."""
        d = Path(save_dir)
        d.mkdir(parents=True, exist_ok=True)
        return [
            self.plot_3d_iou_precision_curve(d / "iou_precision_3d.png"),
            self.plot_3d_ap_curves(d / "ap_curves_3d.png"),
            self.plot_bev_precision_curve(d / "bev_precision.png"),
            self.plot_orientation_performance_heatmap(d / "orientation_heatmap.png"),
        ]

    def plot_all(self, save_dir="./all_plots/"):
        """Everything + summary report (:447)."""
        d = Path(save_dir)
        d.mkdir(parents=True, exist_ok=True)
        out = self.plot_2d_evaluation(d) + self.plot_3d_evaluation(d)
        out.append(self._generate_summary_report(d))
        return out

    def _generate_summary_report(self, save_dir):
        """Text summary of final metrics (:476)."""
        d = Path(save_dir)
        lines = [f"Training summary ({self.results_path})",
                 f"epochs: {int(self._epochs[-1])}",
                 f"source: {'DEMO DATA (results.csv unreadable)' if self.demo else 'results.csv'}"]
        for name, v in self.data.items():
            if name == "epoch":
                continue
            lines.append(f"{name}: final={v[-1]:.5f} best={np.nanmax(v):.5f} "
                         f"@epoch {int(self._epochs[int(np.nanargmax(v))])}")
        p = d / "summary_report.txt"
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    @staticmethod
    def _save(fig, save_path):
        import matplotlib.pyplot as plt

        if save_path:
            fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return str(save_path) if save_path else None
