"""Callback event bus — the glue that attaches trackers, loggers and user
hooks to the engine without coupling.

Behavioral spec: ultralytics/utils/callbacks/base.py:10-217 (the ~25 no-op
events from on_pretrain_routine_start to teardown, run_callbacks dispatch,
default integration loading). Integrations present here: CSV (built into the
trainer), JSONL event log, TensorBoard via flax.metrics when available —
the W&B/Comet/MLflow/etc. hooks register the same way when their packages
exist (they are not baked into this image; the registry gates them).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path

EVENTS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_batch_end",
    "on_predict_postprocess_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]


def get_default_callbacks() -> dict:
    return defaultdict(list, {e: [] for e in EVENTS})


class CallbackMixin:
    """Adds a callback registry + dispatch to engine objects."""

    def init_callbacks(self, callbacks: dict | None = None):
        self.callbacks = callbacks if callbacks is not None else get_default_callbacks()

    def add_callback(self, event: str, fn):
        if event not in self.callbacks:
            raise KeyError(f"unknown callback event '{event}'; valid: {EVENTS}")
        self.callbacks[event].append(fn)

    def run_callbacks(self, event: str):
        for fn in self.callbacks.get(event, []):
            fn(self)


class JSONLLogger:
    """Minimal structured run logger: one JSON line per fired event."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def hook(self, event: str):
        def fn(obj):
            rec = {"t": round(time.time(), 3), "event": event}
            for attr in ("epoch", "best_fitness"):
                if hasattr(obj, attr):
                    v = getattr(obj, attr)
                    if isinstance(v, (int, float, str)):
                        rec[attr] = v
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        return fn

    def register(self, target: CallbackMixin, events=("on_train_epoch_end", "on_model_save", "on_train_end")):
        for e in events:
            target.add_callback(e, self.hook(e))


def try_register_tensorboard(target: CallbackMixin, log_dir: str | Path) -> bool:
    """Attach a TensorBoard scalar writer if a TB backend is importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter  # torch cpu is baked in
    except Exception:
        return False
    writer = SummaryWriter(str(log_dir))

    def on_fit_epoch_end(trainer):
        metrics = getattr(trainer, "last_metrics", {}) or {}
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                writer.add_scalar(k, v, getattr(trainer, "epoch", 0))

    target.add_callback("on_fit_epoch_end", on_fit_epoch_end)
    return True


INTEGRATIONS = ("tensorboard", "wandb", "comet", "mlflow", "clearml", "dvc", "neptune", "raytune")


def try_register_integrations(target: CallbackMixin, log_dir, enabled=INTEGRATIONS) -> dict:
    """Attach every importable logger integration; returns {name: attached}.

    Mirrors the reference's default-callback loading (utils/callbacks/base.py:
    195-211) where each of the 8 integrations registers iff its package
    imports. Only TensorBoard's backend is baked into this image; the others
    gate the same way and activate when their packages exist.
    """
    status = {}
    for name in enabled:
        if name == "tensorboard":
            status[name] = try_register_tensorboard(target, log_dir)
            continue
        mod = {"wandb": "wandb", "comet": "comet_ml", "mlflow": "mlflow",
               "clearml": "clearml", "dvc": "dvclive", "neptune": "neptune",
               "raytune": "ray"}[name]
        try:
            imported = __import__(mod)
        except Exception:
            status[name] = False
            continue
        hook = _make_scalar_hook(name, imported, log_dir)
        if hook is None:  # backend importable but no usable sink — honest False
            status[name] = False
            continue
        target.add_callback("on_fit_epoch_end", hook)
        status[name] = True
    return status


def _make_scalar_hook(name: str, mod, log_dir):
    """Per-backend scalar forwarding for on_fit_epoch_end (reference
    utils/callbacks/{comet,clearml,dvc,neptune,raytune,wandb,mlflow}.py).
    Returns None when the backend has no reachable sink (e.g. neptune with no
    credentials), so the registry reports False instead of attaching a no-op.
    """

    def _metrics(trainer):
        return {k: v for k, v in (getattr(trainer, "last_metrics", {}) or {}).items()
                if isinstance(v, (int, float))}

    if name == "wandb":
        def hook(trainer):
            if getattr(mod, "run", None):
                mod.log(_metrics(trainer), step=getattr(trainer, "epoch", 0))
        return hook
    if name == "mlflow":
        def hook(trainer):
            try:
                mod.log_metrics(_metrics(trainer), step=getattr(trainer, "epoch", 0))
            except Exception:
                pass
        return hook
    if name == "comet":
        def hook(trainer):
            exp = mod.get_global_experiment()
            if exp is not None:
                exp.log_metrics(_metrics(trainer), step=getattr(trainer, "epoch", 0),
                                epoch=getattr(trainer, "epoch", 0))
        return hook
    if name == "clearml":
        def hook(trainer):
            task = mod.Task.current_task()
            if task is not None:
                logger = task.get_logger()
                for k, v in _metrics(trainer).items():
                    title, _, series = k.partition("/")
                    logger.report_scalar(title, series or title, float(v),
                                         iteration=getattr(trainer, "epoch", 0))
        return hook
    if name == "dvc":
        try:
            live = mod.Live(str(log_dir), save_dvc_exp=False)
        except Exception:
            return None

        def hook(trainer):
            for k, v in _metrics(trainer).items():
                live.log_metric(k.replace("(", "").replace(")", ""), float(v))
            live.next_step()
        return hook
    if name == "neptune":
        run = None
        try:  # only works with configured credentials / anonymous mode
            run = mod.init_run(mode="offline")
        except Exception:
            return None

        def hook(trainer, _run=run):
            for k, v in _metrics(trainer).items():
                _run[k].append(value=float(v), step=getattr(trainer, "epoch", 0))
        return hook
    if name == "raytune":
        def hook(trainer):
            try:
                from ray import train as _train

                _train.report(_metrics(trainer))
            except Exception:
                pass  # no active Ray session
        return hook
    return None
