"""Asset download utilities — gated for offline environments.

Behavioral spec: ultralytics/utils/downloads.py (GitHub asset fetch, zip
handling, safe_download). This build runs zero-egress: the API surface is
kept (so user code and configs port over) but network fetches raise a clear
error instead of hanging; local files and archives still work.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path

from edgeyolo_tpu.utils import LOGGER

GITHUB_ASSETS_REPO = "ultralytics/assets"


def is_url(s) -> bool:
    s = str(s)
    return s.startswith(("http://", "https://", "rtsp://", "rtmp://", "ftp://"))


def unzip_file(file: str | Path, path: str | Path | None = None, exist_ok: bool = False) -> Path:
    """Extract a zip next to itself (or into `path`)."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        top = {Path(n).parts[0] for n in z.namelist() if Path(n).parts}
        target = path if len(top) == 1 else path / file.stem
        if target.exists() and not exist_ok and any(target.iterdir()):
            LOGGER.info(f"unzip_file: {target} exists, skipping extraction")
            return target
        z.extractall(path if len(top) == 1 else target)
    return path / next(iter(top)) if len(top) == 1 else target


def zip_directory(directory: str | Path, compress: bool = True) -> Path:
    directory = Path(directory)
    out = directory.with_suffix(".zip")
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(out, "w", mode) as z:
        for f in directory.rglob("*"):
            if f.is_file():
                z.write(f, f.relative_to(directory.parent))
    return out


def safe_download(url: str, file: str | Path | None = None, unzip: bool = True, **kwargs) -> Path:
    """Resolve a URL to a local file. Local paths pass through; network
    fetches are unavailable in this offline build."""
    if not is_url(url):
        p = Path(url)
        if p.exists():
            return unzip_file(p) if (unzip and p.suffix == ".zip") else p
        raise FileNotFoundError(f"{url} does not exist locally")
    raise ConnectionError(
        f"cannot download {url}: this build runs in a zero-egress environment. "
        "Place the file locally and pass its path instead."
    )


def attempt_download_asset(file: str | Path, repo: str = GITHUB_ASSETS_REPO, **kwargs) -> str:
    """Reference API: resolve an asset name (e.g. yolo11n.pt) locally or fail
    with the offline explanation."""
    p = Path(file)
    if p.exists():
        return str(p)
    raise FileNotFoundError(
        f"asset '{file}' not found locally and downloads from {repo} are "
        "unavailable offline"
    )
