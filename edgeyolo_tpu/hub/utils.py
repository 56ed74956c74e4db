"""HUB support: connectivity probe and the rate-limited telemetry queue.

Behavioral spec: ultralytics/hub/utils.py — `ONLINE` check, `Events` class
(hub/utils.py:170): an opt-in, 30s-rate-limited anonymous event queue that
drains at most 25 events per POST. Here the queue logic is identical but the
transport is gated on `ONLINE`; with zero egress it simply never sends, so
the class is exercised by tests without touching the network.
"""

from __future__ import annotations

import os
import random
import time

HUB_API_ROOT = os.environ.get("EDGEYOLO_HUB_API", "https://api.invalid")
HUB_WEB_ROOT = os.environ.get("EDGEYOLO_HUB_WEB", "https://hub.invalid")


def _probe_online() -> bool:
    """True when the hub endpoint is reachable. Zero-egress images: False."""
    if os.environ.get("EDGEYOLO_OFFLINE", "1") == "1":
        return False
    import socket

    try:  # pragma: no cover - requires network
        socket.create_connection(("1.1.1.1", 443), timeout=1.0).close()
        return True
    except OSError:
        return False


ONLINE = _probe_online()


class Events:
    """Anonymous usage event queue: rate-limited, capped, offline-silent."""

    url = f"{HUB_API_ROOT}/events"

    def __init__(self, enabled: bool | None = None):
        self.events: list[dict] = []
        self.rate_limit = 30.0  # seconds between sends
        self.t = 0.0
        self.metadata = {
            "session_id": round(random.random() * 1e15),
            "engine": "edgeyolo_tpu",
        }
        self.enabled = ONLINE if enabled is None else enabled

    def __call__(self, cfg, device=None):
        """Queue one event; attempt a send when the rate limit allows."""
        if not self.enabled:
            return
        if len(self.events) < 25:
            self.events.append({
                "name": f"{getattr(cfg, 'task', 'unknown')}_{getattr(cfg, 'mode', 'unknown')}",
                "params": dict(self.metadata),
            })
        now = time.time()
        if now - self.t < self.rate_limit:
            return
        self._send()
        self.events = []
        self.t = now

    def _send(self):  # pragma: no cover - requires network
        if not ONLINE:
            return


events = Events()
