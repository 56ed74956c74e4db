"""File and path helpers (save-dir policy, path incrementing)."""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
from datetime import datetime
from pathlib import Path


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """Increment a path, e.g. runs/exp -> runs/exp2, runs/exp3, ... unless exist_ok."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path: str | Path) -> int:
    """Days since last modification."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_size(path: str | Path) -> float:
    """File or directory size in MB."""
    mb = 1 << 20
    path = Path(path)
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent 'last' checkpoint under search_dir (for resume)."""
    ckpts = glob.glob(f"{search_dir}/**/last*", recursive=True)
    return max(ckpts, key=os.path.getctime) if ckpts else ""


@contextlib.contextmanager
def spaces_in_path(path: str | Path):
    """Context manager yielding a space-free copy of a path (some tools choke on spaces)."""
    if " " in str(path):
        path = Path(path)
        with tempfile.TemporaryDirectory() as tmp:
            tmp_path = Path(tmp) / path.name.replace(" ", "_")
            if path.is_dir():
                shutil.copytree(path, tmp_path)
            elif path.is_file():
                tmp_path.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(path, tmp_path)
            try:
                yield tmp_path
            finally:
                if tmp_path.is_dir():
                    shutil.copytree(tmp_path, path, dirs_exist_ok=True)
                elif tmp_path.is_file():
                    shutil.copy2(tmp_path, path)
    else:
        yield Path(path)
