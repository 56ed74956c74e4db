"""Environment checks: versions, imgsz validation, system info.

Behavioral spec: ultralytics/utils/checks.py (check_imgsz:~110, check_version,
collect_system_info) — without the auto-pip-install machinery (this
environment is frozen; we gate instead of installing).
"""

from __future__ import annotations

import math
import platform
from importlib import metadata

from edgeyolo_tpu.utils import LOGGER, colorstr, make_divisible


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2, floor: int = 0):
    """Round image size up to a stride multiple, warning on change."""
    stride = int(stride)
    if isinstance(imgsz, (int, float)):
        imgsz = [int(imgsz)]
    elif isinstance(imgsz, (list, tuple)):
        imgsz = [int(x) for x in imgsz]
    else:
        raise TypeError(f"imgsz={imgsz!r} must be int or list of ints")
    sz = [max(make_divisible(x, stride), floor) for x in imgsz]
    if sz != imgsz:
        LOGGER.warning(f"imgsz={imgsz} must be a multiple of stride {stride}, updating to {sz}")
    return sz[0] if (len(sz) == 1 and max_dim == 2) else sz


def check_version(current: str, required: str = "", name: str = "version", hard: bool = False) -> bool:
    """Compare dotted versions against a constraint string like '>=1.0,<3.0'."""

    def parse(v: str):
        return tuple(int(x) for x in ("".join(c for c in p if c.isdigit()) or "0" for p in v.split(".")[:3]))

    if not required:
        return True
    ok = True
    for con in required.split(","):
        con = con.strip()
        op = "".join(c for c in con if c in "<>=!~")
        ver = con.lstrip("<>=!~")
        c, r = parse(current), parse(ver)
        ok &= {
            "==": c == r, "!=": c != r, ">=": c >= r, "<=": c <= r,
            ">": c > r, "<": c < r, "": c >= r, "~=": c[:2] == r[:2],
        }.get(op, c >= r)
    if not ok and hard:
        raise ModuleNotFoundError(f"{name}{required} required, found {current}")
    return bool(ok)


def check_python(minimum: str = "3.10.0") -> bool:
    return check_version(platform.python_version(), f">={minimum}", "python", hard=True)


def check_requirements(requirements=(), hard: bool = False) -> bool:
    """Verify importable packages exist (no installation — frozen env)."""
    missing = []
    for r in [requirements] if isinstance(requirements, str) else requirements:
        name = r.split(">=")[0].split("==")[0].strip()
        try:
            metadata.version(name)
        except metadata.PackageNotFoundError:
            missing.append(r)
    if missing:
        msg = f"missing requirements (frozen environment, cannot auto-install): {missing}"
        if hard:
            raise ModuleNotFoundError(msg)
        LOGGER.warning(msg)
        return False
    return True


def collect_system_info() -> str:
    import jax

    lines = [
        f"{colorstr('edgeyolo_tpu system info')}",
        f"python          {platform.python_version()}",
        f"platform        {platform.platform()}",
        f"jax             {jax.__version__}",
        f"devices         {jax.devices()}",
        f"default backend {jax.default_backend()}",
    ]
    for pkg in ("flax", "optax", "orbax-checkpoint", "numpy", "pillow"):
        try:
            lines.append(f"{pkg:<15} {metadata.version(pkg)}")
        except metadata.PackageNotFoundError:
            lines.append(f"{pkg:<15} (not installed)")
    return "\n".join(lines)


def check_amp() -> bool:
    """bf16 is native on TPU — no loss-scale sanity dance needed
    (reference needs check_amp for CUDA fp16, trainer.py:261-268)."""
    import jax

    return jax.devices()[0].platform != "cpu"
