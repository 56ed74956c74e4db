"""Evolutionary hyperparameter tuner.

Behavioral spec: ultralytics/engine/tuner.py:33-242 — 22-key search space
with (min, max[, gain]) bounds, mutate the best CSV row with probability 0.5
and sigma 0.2, retrain per iteration, track tune_results.csv and best
hyperparameters.
"""

from __future__ import annotations

import csv
import random
import shutil
import time
from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER, colorstr, yaml_save


DEFAULT_SPACE = {
    # key: (min, max, [gain])
    "lr0": (1e-5, 1e-1),
    "lrf": (0.0001, 0.1),
    "momentum": (0.7, 0.98, 0.3),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (1.0, 20.0),
    "cls": (0.2, 4.0),
    "dfl": (0.4, 6.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.95),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "bgr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}


class Tuner:
    def __init__(self, args: dict, space: dict | None = None, save_dir: str | Path = "runs/tune"):
        self.space = space or DEFAULT_SPACE
        self.args = dict(args)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv = self.save_dir / "tune_results.csv"

    def _mutate(self, parent: dict, mutation: float = 0.8, sigma: float = 0.2) -> dict:
        """Gaussian mutation of the best row (reference tuner.py:104-160)."""
        rng = np.random.default_rng()
        hyp = {}
        gains = np.array([(self.space[k][2] if len(self.space[k]) > 2 else 1.0) for k in self.space])
        while True:
            mask = (rng.random(len(self.space)) < mutation) * rng.standard_normal(len(self.space)) * gains * sigma
            if np.any(mask != 0):
                break
        for (k, bounds), m in zip(self.space.items(), mask):
            base = float(parent.get(k, (bounds[0] + bounds[1]) / 2))
            v = base * (1 + m)
            hyp[k] = float(np.clip(v, bounds[0], bounds[1]))
        # snap to sensible precision
        return {k: round(v, 5) for k, v in hyp.items()}

    def _best_row(self) -> tuple[dict, float]:
        if not self.csv.exists():
            return {k: self.args.get(k, (b[0] + b[1]) / 2) for k, b in self.space.items()}, -1.0
        rows = list(csv.DictReader(open(self.csv)))
        if not rows:
            return dict(self.args), -1.0
        best = max(rows, key=lambda r: float(r["fitness"]))
        return {k: float(best[k]) for k in self.space if k in best}, float(best["fitness"])

    def __call__(self, model_factory, iterations: int = 10, **train_kwargs):
        """Run the evolve loop: model_factory() -> fresh YOLO handle each iter.

        Resumes from an existing tune_results.csv (reference tuner.py:77-103):
        prior rows count toward `iterations` and the best row seeds mutation.
        """
        done = 0
        if self.csv.exists():
            done = len(list(csv.DictReader(open(self.csv))))
            if done:
                LOGGER.info(f"{colorstr('tuner:')} resuming from {self.csv} ({done} prior iterations)")
        for it in range(done, iterations):
            parent, best_fit = self._best_row()
            hyp = self._mutate(parent) if best_fit >= 0 else {k: float(v) for k, v in parent.items()}
            LOGGER.info(f"{colorstr('tuner:')} iteration {it + 1}/{iterations} hyp={hyp}")
            model = model_factory()
            t0 = time.time()
            try:
                fitness = model.train(**{**train_kwargs, **hyp})
            except Exception as e:
                LOGGER.warning(f"tuner iteration failed: {e}")
                fitness = 0.0
            row = {"iter": it, "fitness": float(fitness or 0.0), "time_s": round(time.time() - t0, 1), **hyp}
            write_header = not self.csv.exists()
            with open(self.csv, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(row))
                if write_header:
                    w.writeheader()
                w.writerow(row)
        best, fit = self._best_row()
        yaml_save(self.save_dir / "best_hyperparameters.yaml", best,
                  header=f"# best fitness {fit:.5f} over {iterations} iterations\n")
        LOGGER.info(f"{colorstr('tuner:')} done, best fitness {fit:.4f} -> {self.save_dir}")
        return best, fit
