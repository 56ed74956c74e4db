"""Typed run-configuration system.

Mirrors the reference surface (get_cfg/check_cfg semantics, precedence
default < overrides, typo suggestions; reference behavior:
ultralytics/cfg/__init__.py:268-480) with a fresh implementation.
"""

from __future__ import annotations

import difflib
from pathlib import Path
from types import SimpleNamespace
from typing import Any

from edgeyolo_tpu.utils import (
    DEFAULT_CFG_DICT,
    LOGGER,
    ROOT,
    IterableSimpleNamespace,
    colorstr,
    yaml_load,
)

# Type contracts for config keys (used by check_cfg).
CFG_FLOAT_KEYS = frozenset({"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace", "batch"})
CFG_FRACTION_KEYS = frozenset({
    "dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr", "bgr",
    "mosaic", "mixup", "copy_paste", "conf", "iou", "fraction", "erasing", "crop_fraction",
    "photometric",
})
CFG_INT_KEYS = frozenset({
    "epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio", "max_det",
    "vid_stride", "line_width", "nbs", "save_period", "opset", "fsdp",
})
CFG_BOOL_KEYS = frozenset({
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "overlap_mask", "val", "save_json", "save_hybrid", "half", "dnn", "plots", "show",
    "save_txt", "save_conf", "save_crop", "save_frames", "show_labels", "show_conf",
    "visualize", "augment", "agnostic_nms", "retina_masks", "show_boxes", "keras",
    "optimize", "int8", "dynamic", "simplify", "nms", "profile", "multi_scale", "amp",
})

MODELS_DIR = Path(ROOT) / "cfg" / "models"
DATASETS_DIR = Path(ROOT) / "cfg" / "datasets"


def cfg2dict(cfg: str | Path | dict | SimpleNamespace) -> dict:
    """Convert any config representation to a plain dict."""
    if isinstance(cfg, (str, Path)):
        return yaml_load(cfg)
    if isinstance(cfg, SimpleNamespace):
        return vars(cfg)
    return dict(cfg)


def check_dict_alignment(base: dict, custom: dict, e: Exception | None = None) -> None:
    """Raise with did-you-mean suggestions when custom keys are not in base."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, list(base), n=3, cutoff=0.5)
            matches = [f"{m}={base[m]}" if base.get(m) is not None else m for m in matches]
            hint = f"Similar arguments: {matches}. " if matches else ""
            msgs.append(f"'{colorstr('red', 'bold', k)}' is not a valid argument. {hint}")
        raise SyntaxError("\n".join(msgs)) from e


def check_cfg(cfg: dict, hard: bool = True) -> None:
    """Validate types and value ranges of config keys, coercing when safe."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be a number (got {type(v).__name__})")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be a number (got {type(v).__name__})")
                v = cfg[k] = float(v)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int (got {type(v).__name__})")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be a bool (got {type(v).__name__})")
            cfg[k] = bool(v)


def get_cfg(cfg: str | Path | dict | SimpleNamespace = None, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge defaults, a config source and overrides into a typed namespace.

    Precedence (low→high): package defaults < cfg < overrides.
    """
    cfg = cfg2dict(cfg) if cfg is not None else dict(DEFAULT_CFG_DICT)
    merged = {**DEFAULT_CFG_DICT, **cfg}
    if overrides:
        overrides = cfg2dict(overrides)
        overrides.pop("save_dir", None)
        check_dict_alignment(merged, overrides)
        merged = {**merged, **overrides}
    # normalize
    for k in ("project", "name"):
        if k in merged and isinstance(merged[k], (int, float)):
            merged[k] = str(merged[k])
    if merged.get("name") == "model" and merged.get("model"):
        merged["name"] = str(merged["model"]).rpartition(".")[0]
    check_cfg(merged)
    return IterableSimpleNamespace(**merged)


def get_save_dir(args: SimpleNamespace, name: str | None = None) -> Path:
    """Resolve the run output directory: {project}/{name}, incremented if exists."""
    from edgeyolo_tpu.utils.files import increment_path

    project = args.project or Path("runs") / args.task
    name = name or args.name or f"{args.mode}"
    return increment_path(Path(project) / name, exist_ok=getattr(args, "exist_ok", False))


def find_model_yaml(model: str | Path) -> Path:
    """Resolve a model name like 'yolo11n.yaml' to a bundled spec path."""
    p = Path(model)
    if p.exists():
        return p
    import re

    stem = p.stem
    # strip a trailing scale char (yolo11n -> yolo11, scale n)
    m = re.match(r"^(.*yolo[v]?\d+)([nslmx])?([-_].+)?$", stem)
    unified = f"{m.group(1)}{m.group(3) or ''}" if m else stem
    for cand in (MODELS_DIR / f"{stem}.yaml", MODELS_DIR / f"{unified}.yaml"):
        if cand.exists():
            return cand
    hits = sorted(MODELS_DIR.rglob(f"{unified}.yaml")) or sorted(MODELS_DIR.rglob(f"{stem}.yaml"))
    if hits:
        return hits[0]
    # case-insensitive fallback: reference names mix case (yolo11-GF2Detect)
    # while bundled specs are lowercase
    lower = {f.stem.lower(): f for f in MODELS_DIR.rglob("*.yaml")}
    for cand in (stem.lower(), unified.lower()):
        if cand in lower:
            return lower[cand]
    raise FileNotFoundError(f"model spec '{model}' not found in {MODELS_DIR}")


def guess_model_scale(model_path: str | Path) -> str:
    """Extract the compound-scale char (n/s/m/l/x) from a model name."""
    import re

    m = re.search(r"yolo[v]?\d+([nslmx])", Path(model_path).stem)
    return m.group(1) if m else ""
