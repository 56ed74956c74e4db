"""Plotting: annotated batches, label stats, training curves, PR curves.

Behavioral spec: ultralytics/utils/plotting.py (Annotator, plot_images,
plot_labels, plot_results) and metrics.py:456-503 (PR/F1 curve figures).
PIL for image annotation, matplotlib (Agg) for figures.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from edgeyolo_tpu.engine.results import Results, _colors  # noqa: E402
from edgeyolo_tpu.utils import LOGGER  # noqa: E402


def plot_images(images: np.ndarray, cls: np.ndarray, bboxes: np.ndarray, mask_gt: np.ndarray,
                fname: str | Path = "batch.jpg", names: dict | None = None, max_subplots: int = 16):
    """Tile a training batch with its (normalized xywh) boxes drawn."""
    from PIL import Image, ImageDraw

    b = min(len(images), max_subplots)
    n = int(np.ceil(np.sqrt(b)))
    s = images.shape[1]
    canvas = Image.new("RGB", (n * s, n * s), (114, 114, 114))
    for i in range(b):
        im = images[i]
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        tile = Image.fromarray(im)
        draw = ImageDraw.Draw(tile)
        for c, bb, m in zip(cls[i], bboxes[i], mask_gt[i]):
            if m <= 0:
                continue
            x, y, w, h = bb * s
            draw.rectangle([x - w / 2, y - h / 2, x + w / 2, y + h / 2],
                           outline=_colors(int(c)), width=2)
        canvas.paste(tile, ((i % n) * s, (i // n) * s))
    canvas.save(fname)
    return str(fname)


def plot_labels(cls: np.ndarray, boxes: np.ndarray, names: dict, save_dir: Path):
    """Class histogram + box w/h scatter."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4), tight_layout=True)
    nc = int(cls.max()) + 1 if len(cls) else 1
    axes[0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0].set_xlabel("class")
    axes[0].set_ylabel("instances")
    if len(boxes):
        axes[1].scatter(boxes[:, 2], boxes[:, 3], s=4, alpha=0.4)
    axes[1].set_xlabel("width")
    axes[1].set_ylabel("height")
    out = save_dir / "labels.jpg"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def plot_results(csv_file: str | Path, save_dir: Path | None = None):
    """Training curves from results.csv."""
    import csv as csv_mod

    csv_file = Path(csv_file)
    save_dir = Path(save_dir or csv_file.parent)
    with open(csv_file) as f:
        rows = list(csv_mod.DictReader(f))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch", "time") and rows[0][k] != ""]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(4, n)
    rws = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rws, cols, figsize=(4 * cols, 3 * rws), tight_layout=True, squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        try:
            vals = [float(r[k]) for r in rows]
        except ValueError:
            continue
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    out = save_dir / "results.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return str(out)


def plot_pr_curve(px: np.ndarray, py: np.ndarray, ap: np.ndarray, save_path: Path, names: dict):
    fig, ax = plt.subplots(1, 1, figsize=(6, 5), tight_layout=True)
    for i in range(py.shape[0]):
        ax.plot(px, py[i], linewidth=1, label=f"{names.get(i, i)} {ap[i, 0]:.3f}")
    ax.plot(px, py.mean(0), linewidth=2, color="blue",
            label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return str(save_path)


def plot_confusion_matrix(matrix: np.ndarray, names: dict, save_path: Path, normalize: bool = True):
    m = matrix.astype(float)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    fig, ax = plt.subplots(figsize=(6, 5), tight_layout=True)
    im = ax.imshow(m, cmap="Blues")
    labels = [names.get(i, str(i)) for i in range(len(m) - 1)] + ["background"]
    ax.set_xticks(range(len(labels)))
    ax.set_yticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.colorbar(im)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return str(save_path)


def feature_visualization(x, module_type: str, stage: int, save_dir, n: int = 32):
    """Save the first n channels of one layer's NHWC feature map as a
    grayscale grid PNG (reference utils/plotting.py feature_visualization —
    same stage{i}_{type}_features.png naming, head/final layers skipped by
    the caller)."""
    import math

    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    x = np.asarray(x)
    if x.ndim != 4 or 1 in x.shape[1:3]:
        return None
    _, h, w, c = x.shape
    n = min(n, c)
    cols = 8
    rows = math.ceil(n / cols)
    fig, axs = plt.subplots(rows, cols, figsize=(cols * 1.6, rows * 1.6), tight_layout=True)
    axs = np.atleast_1d(axs).ravel()
    for i in range(len(axs)):
        axs[i].axis("off")
        if i < n:
            axs[i].imshow(x[0, :, :, i], cmap="gray")
    f = save_dir / f"stage{stage}_{module_type}_features.png"
    fig.savefig(f, dpi=96, bbox_inches="tight")
    plt.close(fig)
    return f
