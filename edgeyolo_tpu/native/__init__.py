"""Native IO runtime: build-on-first-use C++ extension + numpy wrappers.

`decode_letterbox_batch(paths_or_bytes, imgsz)` is the fast path for the
training input pipeline (threaded libjpeg decode with DCT prescale + exact
letterbox). When the toolchain or libjpeg is unavailable the package falls
back to the PIL path transparently (`available()` reports which is active).
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np

from edgeyolo_tpu.utils import LOGGER

_HERE = Path(__file__).parent
_mod = None
_tried = False


def _build() -> Path | None:
    """Compile io.cpp into this directory; returns the .so path or None."""
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = _HERE / f"_edgeyolo_io{suffix}"
    src = _HERE / "io.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    inc = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{inc}", str(src), "-ljpeg", "-o", str(so)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except Exception as e:
        LOGGER.info(f"native io build skipped: {e}")
        return None
    if r.returncode != 0:
        LOGGER.info(f"native io build failed (falling back to PIL): {r.stderr[-400:]}")
        return None
    return so


def _load():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    so = _build()
    if so is None:
        return None
    if str(_HERE) not in sys.path:
        sys.path.insert(0, str(_HERE))
    try:
        import _edgeyolo_io  # noqa: PLC0415

        _mod = _edgeyolo_io
        LOGGER.info("native io: libjpeg decode + letterbox active")
    except Exception as e:
        LOGGER.info(f"native io import failed (falling back to PIL): {e}")
        _mod = None
    return _mod


def available() -> bool:
    return _load() is not None


def decode_letterbox(data: bytes | str | Path, imgsz: int, scaleup: bool = True):
    """One JPEG -> (img (S, S, 3) uint8, ratio, (pw, ph), (h0, w0)).
    Raises RuntimeError when the native module is unavailable."""
    m = _load()
    if m is None:
        raise RuntimeError("native io unavailable")
    if isinstance(data, (str, Path)):
        data = Path(data).read_bytes()
    buf, (h0, w0, r, pw, ph) = m.decode_letterbox(data, int(imgsz), bool(scaleup))
    img = np.frombuffer(buf, np.uint8).reshape(imgsz, imgsz, 3)
    return img, r, (pw, ph), (h0, w0)


def decode_letterbox_batch(items, imgsz: int, scaleup: bool = True, threads: int = 4):
    """Batch of JPEGs -> (imgs (B, S, S, 3) uint8, metas list)."""
    m = _load()
    if m is None:
        raise RuntimeError("native io unavailable")
    blobs = [Path(it).read_bytes() if isinstance(it, (str, Path)) else it for it in items]
    buf, metas = m.decode_letterbox_batch(blobs, int(imgsz), bool(scaleup), int(threads))
    imgs = np.frombuffer(buf, np.uint8).reshape(len(blobs), imgsz, imgsz, 3)
    return imgs, [(h0, w0, r, (pw, ph)) for h0, w0, r, pw, ph in metas]
