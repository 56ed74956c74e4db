"""Core utilities: logging, YAML IO, small helpers.

TPU-native rebuild of the support layer described in SURVEY.md §2.10
(reference: ultralytics/utils/__init__.py — behavior only, re-designed for JAX).
"""

from __future__ import annotations

import json
import logging
import math
import os
import platform
import re
import sys
import threading
import time
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import numpy as np
import yaml

# --------------------------------------------------------------------------------------
# Globals
# --------------------------------------------------------------------------------------
RANK = int(os.getenv("RANK", -1))  # retained for API familiarity; SPMD makes it host index
FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]  # edgeyolo_tpu package root
REPO_ROOT = ROOT.parent
DEFAULT_CFG_PATH = ROOT / "cfg" / "default.yaml"
MACOS, LINUX, WINDOWS = (platform.system() == x for x in ("Darwin", "Linux", "Windows"))
VERBOSE = str(os.getenv("EDGEYOLO_VERBOSE", "true")).lower() == "true"

TASKS = frozenset({"detect", "segment", "classify", "pose", "obb"})
MODES = frozenset({"train", "val", "predict", "export", "track", "benchmark", "tune"})


def emojis(s: str = "") -> str:
    """Return a platform-safe version of a string (strip emojis on Windows)."""
    return s.encode().decode("ascii", "ignore") if WINDOWS else s


def set_logging(name: str = "edgeyolo", verbose: bool = True) -> logging.Logger:
    """Configure a stream logger with a terse format."""
    level = logging.INFO if verbose else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def colorstr(*input) -> str:
    """Colorize a string for terminal output, e.g. colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports dict(), iteration and .get()."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


# --------------------------------------------------------------------------------------
# YAML IO
# --------------------------------------------------------------------------------------
def yaml_load(file: str | Path, append_filename: bool = False) -> dict:
    """Load a YAML file to dict, ignoring non-ASCII garbage."""
    path = Path(file)
    assert path.suffix in {".yaml", ".yml"}, f"not a YAML file: {file}"
    with open(path, errors="ignore", encoding="utf-8") as f:
        s = f.read()
        if not s.isprintable():
            s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-￿]+", "", s)
        data = yaml.safe_load(s) or {}
        if append_filename:
            data["yaml_file"] = str(file)
        return data


def yaml_save(file: str | Path, data: dict | None = None, header: str = "") -> None:
    """Save a dict to YAML, converting non-serializable values to str."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    data = data or {}
    clean = {}
    for k, v in data.items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        elif v is not None and not isinstance(v, (int, float, str, bool, list, dict, tuple)):
            v = str(v)
        clean[k] = v
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(data: dict | Path | str) -> None:
    """Pretty-print a dict or YAML file."""
    d = yaml_load(data) if isinstance(data, (str, Path)) else data
    LOGGER.info(yaml.dump(d, sort_keys=False, allow_unicode=True, width=120))


# --------------------------------------------------------------------------------------
# Small helpers
# --------------------------------------------------------------------------------------
def make_divisible(x: float, divisor: int = 8) -> int:
    """Return nearest value divisible by `divisor` (used by width scaling)."""
    return int(math.ceil(x / divisor) * divisor)


def clean_url(url: str) -> str:
    """Strip auth from URL-ish strings."""
    return str(url).split("?")[0]


def url2file(url: str) -> str:
    return Path(clean_url(url)).name


class TryExcept:
    """Context manager / decorator that logs exceptions instead of raising."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, traceback):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True

    def __call__(self, func):
        def wrapper(*a, **kw):
            with self:
                return func(*a, **kw)

        return wrapper


class ThreadingLocked:
    """Decorator serializing calls to a function across threads (host-side stream IO)."""

    def __init__(self):
        self.lock = threading.Lock()

    def __call__(self, f):
        def wrapper(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return wrapper


class Profile:
    """Context-manager timer. JAX equivalent of the reference's CUDA-sync Profile
    (reference behavior: ultralytics/utils/ops.py:17) — blocks on device results instead."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"Elapsed time is {self.t} s"


def init_seeds(seed: int = 0) -> None:
    """Seed host-side RNGs. Device randomness is explicit via jax PRNG keys."""
    import random

    random.seed(seed)
    np.random.seed(seed)


def threaded(func):
    """Run target function in a daemon thread, returning the thread."""

    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


DEFAULT_CFG_DICT: dict[str, Any] = yaml_load(DEFAULT_CFG_PATH) if DEFAULT_CFG_PATH.exists() else {}
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)


class SettingsManager(dict):
    """Persistent user settings JSON (reference SettingsManager,
    utils/__init__.py:1155-1240): versioned schema, default values, reset on
    key/type/version mismatch, update() with key validation.

    The config dir follows the fork's naming ("yolov13",
    utils/__init__.py:777) under ~/.config (or $EDGEYOLO_CONFIG_DIR).
    """

    VERSION = "0.0.6"

    def __init__(self, file: str | Path | None = None):
        if file is None:
            base = Path(os.environ.get("EDGEYOLO_CONFIG_DIR",
                                       Path.home() / ".config" / "yolov13"))
            file = base / "settings.json"
        self.file = Path(file)
        root = Path.cwd()
        self.defaults = {
            "settings_version": self.VERSION,
            "datasets_dir": str(root.parent / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": False,  # offline image: telemetry off by default
            "api_key": "",
            "clearml": True, "comet": True, "dvc": True, "hub": True,
            "mlflow": True, "neptune": True, "raytune": True,
            "tensorboard": True, "wandb": False,
        }
        super().__init__()
        loaded = {}
        if self.file.exists():
            try:
                loaded = json.loads(self.file.read_text())
            except Exception:
                loaded = {}
        self.update_silent({**self.defaults, **loaded})
        ok_keys = set(self.keys()) == set(self.defaults.keys())
        ok_types = all(isinstance(self.get(k), type(v)) for k, v in self.defaults.items())
        ok_ver = self.get("settings_version") == self.VERSION
        if not (ok_keys and ok_types and ok_ver):
            LOGGER.warning("settings reset to defaults (schema changed or file corrupt)")
            self.reset()

    def update_silent(self, d: dict):
        dict.update(self, d)

    def update(self, *args, **kwargs):  # type: ignore[override]
        new = dict(*args, **kwargs)
        for k, v in new.items():
            if k not in self.defaults:
                raise KeyError(f"unknown setting '{k}'; valid keys: {sorted(self.defaults)}")
            want = type(self.defaults[k])
            if not isinstance(v, want):
                raise TypeError(f"setting '{k}' must be {want.__name__}, got {type(v).__name__}")
        dict.update(self, new)
        self.save()

    def reset(self):
        self.clear()
        dict.update(self, self.defaults)
        self.save()

    def save(self):
        try:
            self.file.parent.mkdir(parents=True, exist_ok=True)
            self.file.write_text(json.dumps(dict(self), indent=2))
        except OSError as e:
            LOGGER.warning(f"could not persist settings to {self.file}: {e}")
