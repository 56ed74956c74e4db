"""Classification training: cross-entropy over folder-per-class datasets.

Behavioral spec: ultralytics/models/yolo/classify/train.py
(ClassificationTrainer: classify datasets, v8ClassificationLoss
utils/loss.py:709-717, top1/top5 validation, fitness = top1+top5 / 2
metrics.py:1184-1239). Shares the SPMD skeleton with DetectionTrainer: one
jitted train step (device augmentation + forward + CE + grad + optimizer +
EMA) over the data-parallel mesh, msgpack checkpoints with optimizer sidecar.
"""

from __future__ import annotations

import csv
import json
import math
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from edgeyolo_tpu.data.augment_device import classify_augment_batch
from edgeyolo_tpu.data.classify import ClassificationDataset, ClassifyLoader, check_cls_dataset
from edgeyolo_tpu.parallel.mesh import get_mesh, replicated, shard_batch
from edgeyolo_tpu.train.trainer import (
    EarlyStopping,
    auto_optimizer,
    build_optimizer,
)
from edgeyolo_tpu.utils import LOGGER, colorstr, yaml_save
from edgeyolo_tpu.utils.callbacks import CallbackMixin


class ClassificationTrainer(CallbackMixin):
    """End-to-end classification training on a data-parallel mesh."""

    def __init__(self, model, args, save_dir: str | Path = "runs/classify", callbacks=None):
        self.model = model  # nn.tasks.ClassificationModel handle
        self.args = args
        self.save_dir = Path(save_dir)
        self.best_fitness = 0.0
        self.epoch = 0
        self.last_metrics = {}
        self.init_callbacks(callbacks)

    def train(self):
        args = self.args
        data_cfg = check_cls_dataset(args.data)
        names = data_cfg["names"]
        nc = data_cfg["nc"]
        if nc != self.model.nc:
            raise ValueError(f"dataset nc={nc} != model nc={self.model.nc}")
        self.model.names = names
        imgsz = int(args.imgsz)
        epochs = int(args.epochs)
        bs = int(args.batch)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        yaml_save(self.save_dir / "args.yaml", vars(args))

        train_set = ClassificationDataset(data_cfg["train"], imgsz=imgsz, augment=True,
                                          fraction=float(args.fraction), names=names)
        # drop the partial tail batch (torch drop_last semantics): the loader
        # otherwise wrap-pads it with other images, which would train those
        # fillers at full weight. Kept on for datasets of >= one batch.
        loader = ClassifyLoader(train_set, bs, shuffle=True, seed=int(args.seed),
                                drop_last=len(train_set) >= bs)
        nb = len(loader)

        accumulate = max(round(int(args.nbs) / bs), 1)
        opt_name, lr0, momentum = (
            (args.optimizer, float(args.lr0), float(args.momentum))
            if args.optimizer != "auto"
            else auto_optimizer(nc, float(args.lr0), float(args.momentum), epochs * nb)
        )
        lrf = float(args.lrf)
        we = float(args.warmup_epochs)
        warmup_steps = 0 if (we <= 0 or epochs <= 1) else max(round(we * nb), 100)

        def lr_at(step):
            e = step * accumulate / max(nb, 1)
            if args.cos_lr:
                lf = ((1 - jnp.cos(e / epochs * math.pi)) / 2) * (lrf - 1) + 1
            else:
                lf = jnp.maximum(1 - e / epochs, 0.0) * (1.0 - lrf) + lrf
            warm = jnp.clip((step * accumulate + 1) / max(warmup_steps, 1), 0.0, 1.0) if warmup_steps else 1.0
            return lr0 * lf * warm

        warmup_momentum = float(getattr(args, "warmup_momentum", 0.8))

        def momentum_at(step):
            if not warmup_steps:
                return jnp.asarray(momentum, jnp.float32)
            t = jnp.clip((step * accumulate + 1) / max(warmup_steps, 1), 0.0, 1.0)
            return warmup_momentum + (momentum - warmup_momentum) * t

        decay = float(args.weight_decay) * bs * accumulate / int(args.nbs)
        if self.model.variables is None:
            self.model.init(int(args.seed), imgsz=imgsz, batch=1)
        params = self.model.variables["params"]
        batch_stats = self.model.variables.get("batch_stats", {})
        tx_inner = build_optimizer(params, opt_name, lr0, momentum, decay, lr_at,
                                   momentum_schedule=momentum_at if warmup_steps else None)
        tx = optax.MultiSteps(tx_inner, every_k_schedule=accumulate)
        opt_state = tx.init(params)
        LOGGER.info(f"{colorstr('optimizer:')} {opt_name}(lr={lr0}) classify nc={nc} nb={nb}")

        hyp_dict = {k: v for k, v in vars(args).items() if isinstance(v, (int, float))}
        # string-valued policy knob (reference classify default: randaugment)
        hyp_dict["auto_augment"] = str(getattr(args, "auto_augment", "") or "")
        use_bf16 = bool(args.amp)
        n_avail = len(jax.devices())
        n_dev = max(n for n in range(1, n_avail + 1) if bs % n == 0)
        self.mesh = get_mesh(n_dev)
        net = self.model.net

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state, images, labels, key):
            params, batch_stats, opt_state, ema, step = state
            img01 = classify_augment_batch(images, key, hyp_dict)
            x = img01.astype(jnp.bfloat16) if use_bf16 else img01

            def loss_fn(p):
                logits, mut = net.apply({"params": p, "batch_stats": batch_stats},
                                        x, train=True, mutable=["batch_stats"])
                logits = logits.astype(jnp.float32)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
                return nll, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            did = (new_opt.mini_step == 0).astype(jnp.int32)
            upd = step + did
            d = 0.9999 * (1 - jnp.exp(-upd / 2000.0))
            d = jnp.where(did == 1, d, 1.0)
            new_ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p, ema, new_params)
            return (new_params, new_bs, new_opt, new_ema, upd), loss

        ema = jax.tree.map(jnp.copy, params)
        start_epoch = 0
        if args.resume:
            ck_path = Path(args.resume if isinstance(args.resume, str) else self.save_dir / "last.msgpack")
            if ck_path.exists():
                template = {"params": params, "batch_stats": batch_stats, "ema": ema,
                            "updates": 0, "epoch": 0, "best_fitness": 0.0}
                ck = serialization.from_bytes(template, ck_path.read_bytes())
                params, batch_stats, ema = ck["params"], ck["batch_stats"], ck["ema"]
                opt_path = ck_path.parent / (ck_path.stem + ".opt.msgpack")
                if opt_path.exists():
                    opt_state = serialization.from_bytes(opt_state, opt_path.read_bytes())
                start_epoch = int(ck["epoch"]) + 1
                self.best_fitness = float(ck["best_fitness"])
                LOGGER.info(f"resumed from {ck_path} at epoch {start_epoch}")
        state = (params, batch_stats, opt_state, ema,
                 jnp.asarray(start_epoch * nb // max(accumulate, 1), jnp.int32))
        state = jax.device_put(state, replicated(self.mesh))

        key = jax.random.PRNGKey(int(args.seed))
        stopper = EarlyStopping(int(args.patience))
        csv_path = self.save_dir / "results.csv"
        t_start = time.time()
        self.run_callbacks("on_train_start")
        stop = False
        for epoch in range(start_epoch, epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            losses = []
            for batch in loader:
                key, sub = jax.random.split(key)
                sb = shard_batch({"img": batch["img"], "cls": batch["cls"].astype(np.int32)},
                                 self.mesh)
                state, loss = train_step(state, sb["img"], sb["cls"], sub)
                losses.append(float(loss))
            mloss = float(np.mean(losses)) if losses else 0.0

            self.run_callbacks("on_train_epoch_end")
            fitness_val = None
            metrics_row = {}
            if args.val:
                metrics_row = self._validate(state, data_cfg)
                fitness_val = metrics_row.get("fitness", 0.0)
            self.last_metrics = dict(metrics_row)
            self.run_callbacks("on_fit_epoch_end")
            row = {"epoch": epoch, "time": round(time.time() - t_start, 2),
                   "train/loss": round(mloss, 5),
                   **{k: round(float(v), 5) for k, v in metrics_row.items()},
                   "lr/pg0": round(float(lr_at(np.asarray(int(state[4])))), 6)}
            write_header = not csv_path.exists()
            with open(csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(row))
                if write_header:
                    w.writeheader()
                w.writerow(row)
            LOGGER.info(f"epoch {epoch + 1}/{epochs} loss {mloss:.4f}"
                        + (f" top1 {metrics_row.get('metrics/accuracy_top1', 0):.4f}"
                           if metrics_row else ""))
            if fitness_val is not None and fitness_val >= self.best_fitness:
                self.best_fitness = fitness_val
                self._save_ckpt(state, epoch, "best")
            self._save_ckpt(state, epoch, "last")
            self.run_callbacks("on_model_save")
            if stopper(epoch, fitness_val):
                stop = True
            if stop:
                break

        params_f, batch_stats_f, _, ema_f, _ = jax.device_get(state)
        self.model.variables = {"params": ema_f, "batch_stats": batch_stats_f}
        self.run_callbacks("on_train_end")
        self.run_callbacks("teardown")
        LOGGER.info(f"classify training done, best fitness {self.best_fitness:.4f}")
        return self.best_fitness

    def _validate(self, state, data_cfg) -> dict:
        from edgeyolo_tpu.cfg import get_cfg
        from edgeyolo_tpu.engine.classify import ClassificationValidator

        params, batch_stats, _, ema, _ = state
        if not hasattr(self, "_validator"):
            vargs = get_cfg(overrides={"mode": "val", "data": self.args.data,
                                       "imgsz": self.args.imgsz, "batch": self.args.batch,
                                       "task": "classify"})
            self._validator = ClassificationValidator(vargs, save_dir=self.save_dir / "val")
        variables = {"params": ema, "batch_stats": batch_stats}
        return self._validator(self.model, data=data_cfg, variables=variables,
                               batch_size=int(self.args.batch))

    def _save_ckpt(self, state, epoch: int, name: str):
        params, batch_stats, opt_state, ema, step = jax.device_get(state)
        ckpt = {"params": params, "batch_stats": batch_stats, "ema": ema,
                "updates": int(step), "epoch": epoch,
                "best_fitness": float(self.best_fitness)}
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if name == "last":
            (self.save_dir / "last.opt.msgpack").write_bytes(serialization.to_bytes(opt_state))
        (self.save_dir / f"{name}.msgpack").write_bytes(serialization.to_bytes(ckpt))
        meta = {"epoch": epoch, "best_fitness": float(self.best_fitness),
                "model_yaml": self.model.yaml.get("yaml_file", ""),
                "scale": self.model.scale, "nc": self.model.nc, "names": self.model.names,
                "train_args": {k: v for k, v in vars(self.args).items()
                               if isinstance(v, (int, float, str, bool, type(None)))}}
        (self.save_dir / f"{name}.json").write_text(json.dumps(meta, default=str))
