"""Training loop: optax optimizer, warmup, EMA, grad accumulation, on-device
augmentation, SPMD data parallelism, checkpoints, early stopping.

Behavioral spec: ultralytics/engine/trainer.py:58-690 — warmup lr/momentum
interpolation (366-376), accumulate=round(nbs/batch) (301), clip 10.0 (589),
EMA decay 0.9999*(1-exp(-t/2000)) (torch_utils.py:495-531), linear/cos LR
(646-656), EarlyStopping (torch_utils.py:713), checkpoint contents (513-544),
auto optimizer selection (759-817).

TPU design: ONE jitted train step containing the fused device augmentation,
forward, loss, grad, clip, update and EMA; batch sharded over the "data" mesh
axis, state replicated (XLA inserts the psums — no DDP, no subprocess,
SURVEY.md §2.9). bf16 activations under amp; params/optimizer fp32.
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

from edgeyolo_tpu.data.augment_device import augment_batch
from edgeyolo_tpu.data.dataset import YOLODataset, build_dataloader, check_det_dataset
from edgeyolo_tpu.nn.tasks import amp_cast
from edgeyolo_tpu.parallel.mesh import (
    flat_sharding,
    get_mesh,
    replicated,
    shard_batch,
    shard_flat_state,
)
from edgeyolo_tpu.train.loss import DetectionLoss
from edgeyolo_tpu.utils import LOGGER, colorstr, yaml_save


# ----------------------------------------------------------------------------
# Optimizer construction (reference build_optimizer semantics)
# ----------------------------------------------------------------------------
def _decay_mask(params):
    """True for leaves that get weight decay: conv/dense kernels only
    (BN scale/bias and all biases excluded, reference trainer.py:759-817)."""

    def mask(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        name = keys[-1] if keys else ""
        if name in ("bias", "scale"):
            return False
        if any("bn" in k for k in keys):
            return False
        return name == "kernel"

    return jax.tree_util.tree_map_with_path(mask, params)


def build_optimizer(params, name: str, lr: float, momentum: float, decay: float,
                    schedule, momentum_schedule=None,
                    flat_mask=None) -> optax.GradientTransformation:
    """momentum_schedule: optional step->momentum fn for warmup interpolation
    (reference trainer.py:366-376 interpolates group momentum from
    warmup_momentum to momentum over the warmup window; torch only warms
    groups exposing a `momentum` key, i.e. SGD/RMSProp — Adam's betas are not
    touched — so the same gating applies here).

    flat_mask: when given, `params` is a single raveled vector and weight
    decay applies through this 0/1 vector instead of a per-leaf optax mask —
    the fused-optimizer path (one momentum buffer, ~10 vector ops per update
    instead of ~6 ops x n_leaves; see PERF.md §training)."""
    def _flat_wd_update(updates, state, params):
        return updates + decay * flat_mask * params, state

    if flat_mask is not None:
        wd = optax.GradientTransformation(
            lambda params: optax.EmptyState(), _flat_wd_update)
    else:
        wd = optax.masked(optax.add_decayed_weights(decay), _decay_mask(params))
    if name in {"SGD", "sgd"}:
        if momentum_schedule is not None:
            sgd = optax.inject_hyperparams(optax.sgd, static_args=("nesterov",))(
                learning_rate=schedule, momentum=momentum_schedule, nesterov=True)
        else:
            sgd = optax.sgd(schedule, momentum=momentum, nesterov=True)
        core = optax.chain(wd, sgd)
    elif name in {"Adam", "adam"}:
        # torch Adam couples wd into the gradient (param-group weight_decay)
        core = optax.chain(wd, optax.adam(schedule, b1=momentum, b2=0.999))
    elif name in {"AdamW", "adamw"}:
        # torch AdamW DECOUPLES decay: it bypasses the moment estimates and
        # applies after the adaptive scaling (before the lr multiply)
        if flat_mask is not None:
            core = optax.chain(
                optax.scale_by_adam(b1=momentum, b2=0.999),
                optax.GradientTransformation(lambda params: optax.EmptyState(), _flat_wd_update),
                optax.scale_by_learning_rate(schedule),
            )
        else:
            core = optax.adamw(schedule, b1=momentum, b2=0.999,
                               weight_decay=decay, mask=_decay_mask(params))
    elif name in {"RMSProp", "rmsprop"}:
        if momentum_schedule is not None:
            rms = optax.inject_hyperparams(optax.rmsprop)(
                learning_rate=schedule, momentum=momentum_schedule)
        else:
            rms = optax.rmsprop(schedule, momentum=momentum)
        core = optax.chain(wd, rms)
    else:
        raise ValueError(f"unknown optimizer {name}")
    return optax.chain(optax.clip_by_global_norm(10.0), core)


def auto_optimizer(nc: int, lr0: float, momentum: float, iterations: float):
    """auto rule: AdamW(lr=0.002*5/(4+nc) rounded, m=0.9) for short runs,
    SGD(0.01, 0.937) otherwise (reference trainer.py:773-786)."""
    if iterations > 10000:
        return "SGD", lr0, momentum
    lr_fit = round(0.002 * 5 / (4 + nc), 6)
    return "AdamW", lr_fit, 0.9


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float | None) -> bool:
        if fitness is None:
            return False
        # >= matches the reference exactly (torch_utils.py:742: ">= 0 to allow
        # for early zero-fitness stage of training"); ties advance best_epoch
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"EarlyStopping: no improvement in last {self.patience} epochs, stopping")
        return stop


from edgeyolo_tpu.utils.callbacks import CallbackMixin


class DetectionTrainer(CallbackMixin):
    """End-to-end detection training (callback events fire at the same
    points as the reference loop, utils/callbacks/base.py)."""

    def __init__(self, model, args, save_dir: str | Path = "runs/train", callbacks=None):
        self.model = model  # nn.tasks.DetectionModel handle
        self.args = args
        self.save_dir = Path(save_dir)
        self.best_fitness = 0.0
        self.mesh = None
        self.epoch = 0
        self.last_metrics = {}
        self.init_callbacks(callbacks)

    # -- public entry -----------------------------------------------------------
    def train(self):
        args = self.args
        data_cfg = check_det_dataset(args.data)
        names = data_cfg["names"]
        nc = data_cfg["nc"]
        if nc != self.model.nc:
            raise ValueError(f"dataset nc={nc} != model nc={self.model.nc}")
        self.model.names = names
        imgsz = int(args.imgsz)
        epochs = int(args.epochs)
        bs_raw = float(args.batch)
        if bs_raw <= 0 or 0 < bs_raw < 1:
            # reference batch=-1 -> AutoBatch at 60% memory, 0<batch<1 -> that
            # utilization fraction (engine/trainer.py:282-283, autobatch.py:14);
            # here resolved by the XLA compile-time HBM estimate
            from edgeyolo_tpu.utils.profiling import autobatch as _autobatch

            frac = bs_raw if 0 < bs_raw < 1 else 0.60
            if self.model.variables is None:
                self.model.init(int(args.seed), imgsz=imgsz, batch=1)
            bs_raw = _autobatch(self.model, imgsz=imgsz, fraction=frac, train=True)
            args.batch = bs_raw
        bs = int(bs_raw)

        self.save_dir.mkdir(parents=True, exist_ok=True)
        yaml_save(self.save_dir / "args.yaml", vars(args))

        # multi-host: join the jax.distributed runtime when a launcher exported
        # the coordinator triplet (parallel/distributed.py; on real TPU pods
        # the env probe also covers bare auto-detected initialization)
        import os as _os

        from edgeyolo_tpu.parallel import distributed as _dist

        if ((_os.environ.get("EDGEYOLO_COORDINATOR") or _os.environ.get("EDGEYOLO_NUM_PROCS"))
                and not _dist.is_initialized()):
            _dist.init_distributed()
        n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        if n_proc > 1 and bs % n_proc:
            raise ValueError(f"global batch {bs} must divide across {n_proc} processes")

        task = getattr(self.model, "task", "detect")
        kpt_shape = tuple(self.model.yaml.get("kpt_shape", (17, 3)))
        train_set = YOLODataset(
            data_cfg["train"], imgsz=imgsz, augment=True,
            single_cls=bool(args.single_cls), fraction=float(args.fraction), names=names,
            task=task, kpt_shape=kpt_shape, mask_ratio=int(args.mask_ratio),
            cache=getattr(args, "cache", False),
        )
        # per-host loader: each process feeds bs/n_proc samples of its own
        # disjoint stride; host_local_batch assembles the global jax.Arrays
        loader = build_dataloader(train_set, bs // n_proc, shuffle=True,
                                  seed=int(args.seed), drop_last=False,
                                  shard_rank=jax.process_index(), shard_count=n_proc)
        nb = len(loader)

        # optimizer
        accumulate = max(round(int(args.nbs) / bs), 1)
        iterations = epochs * nb
        opt_name, lr0, momentum = (
            (args.optimizer, float(args.lr0), float(args.momentum))
            if args.optimizer != "auto"
            else auto_optimizer(nc, float(args.lr0), float(args.momentum), iterations)
        )
        lrf = float(args.lrf)
        we = float(args.warmup_epochs)
        # reference floors warmup at 100 iters (trainer.py:344); warmup_epochs=0 disables
        warmup_steps = 0 if (we <= 0 or epochs <= 1) else max(round(we * nb), 100)

        def lr_at(step):
            # per-update schedule: warmup then linear/cos per-epoch decay
            e = step * accumulate / max(nb, 1)
            if args.cos_lr:
                lf = ((1 - jnp.cos(e / epochs * math.pi)) / 2) * (lrf - 1) + 1
            else:
                lf = jnp.maximum(1 - e / epochs, 0.0) * (1.0 - lrf) + lrf
            warm = jnp.clip((step * accumulate + 1) / max(warmup_steps, 1), 0.0, 1.0) if warmup_steps else 1.0
            return lr0 * lf * warm

        warmup_momentum = float(getattr(args, "warmup_momentum", 0.8))

        def momentum_at(step):
            # per-update momentum warmup: warmup_momentum -> momentum over the
            # warmup window (reference trainer.py:374-376)
            if not warmup_steps:
                return jnp.asarray(momentum, jnp.float32)
            t = jnp.clip((step * accumulate + 1) / max(warmup_steps, 1), 0.0, 1.0)
            return warmup_momentum + (momentum - warmup_momentum) * t

        # weight decay scaled like reference: decay * batch * accumulate / nbs
        decay = float(args.weight_decay) * bs * accumulate / int(args.nbs)

        if self.model.variables is None:
            self.model.init(int(args.seed), imgsz=imgsz, batch=1)
        variables = self.model.variables
        params, batch_stats = variables["params"], variables.get("batch_stats", {})

        # data-parallel mesh over the largest device count that divides the batch;
        # args.device accepts an int to cap the mesh (cfg/default.yaml "mesh axis
        # sizes"), e.g. device=1 forces a single-device run
        n_avail = len(jax.devices())
        dev_arg = getattr(args, "device", None)
        if dev_arg is not None and str(dev_arg).isdigit() and int(dev_arg) > 0:
            n_avail = min(n_avail, int(dev_arg))
        n_dev = max(n for n in range(1, n_avail + 1) if bs % n == 0)
        if n_dev < n_avail:
            LOGGER.warning(f"batch {bs} not divisible by {n_avail} devices; using {n_dev}-device mesh")
        # optional ZeRO-style axis: args.fsdp shards the flat param/momentum/
        # EMA vectors over an "fsdp" sub-axis of the mesh (parallel/mesh.py).
        # The batch still shards over all devices; beyond the reference's DDP,
        # which always replicates optimizer state (SURVEY §2.9).
        fsdp = int(getattr(args, "fsdp", 0) or 0)
        if fsdp > 1 and n_dev % fsdp != 0:
            LOGGER.warning(f"fsdp={fsdp} does not divide the {n_dev}-device mesh; disabling fsdp")
            fsdp = 0
        self.mesh = get_mesh(n_dev, fsdp=max(fsdp, 1))
        fsdp_on = "fsdp" in self.mesh.axis_names
        rep_sh, flat_sh = replicated(self.mesh), flat_sharding(self.mesh)

        # fused-optimizer state: params/EMA/momentum live as single raveled
        # vectors on device, so optimizer + EMA are ~10 whole-model vector ops
        # per step instead of ~6 ops per leaf (the per-leaf op storm was a
        # fixed ~40 ms/step on TPU — PERF.md §training). The gradient flows
        # through unravel: d(unravel)/d(flat) is just the inverse ravel, which
        # XLA fuses. Pytrees reappear only at epoch boundaries (val/ckpt).
        from jax.flatten_util import ravel_pytree

        p_flat, unravel0 = ravel_pytree(params)
        flat_len = int(p_flat.size)
        # fsdp: device_put (unlike GSPMD inside jit) refuses uneven shards, so
        # pad the raveled vectors to a multiple of the fsdp axis; pad lanes
        # carry zeros through optimizer/EMA and are sliced off before unravel
        pad = (-flat_len) % self.mesh.shape.get("fsdp", 1)
        unravel = (lambda pf: unravel0(pf[:flat_len])) if pad else unravel0
        if pad:
            p_flat = jnp.pad(p_flat, (0, pad))
        self._unravel = unravel
        mask_flat, _ = ravel_pytree(jax.tree.map(
            lambda p, mb: jnp.full_like(p, 1.0 if mb else 0.0),
            params, _decay_mask(params)))
        if pad:
            mask_flat = jnp.pad(mask_flat, (0, pad))
        # freeze: zero grads AND updates of the named layer indices (reference
        # trainer.py:246 sets requires_grad=False per `model.{i}.` prefix —
        # masking the update too keeps weight decay off frozen params, like
        # torch skipping them entirely)
        freeze_arg = getattr(args, "freeze", None)
        freeze_flat = None
        if freeze_arg not in (None, 0, False):
            import re as _re

            idxs = ({int(i) for i in freeze_arg} if isinstance(freeze_arg, (list, tuple))
                    else set(range(int(freeze_arg))))

            def _keep(top: str) -> float:
                m = _re.match(r"^l(\d+)_", top)
                return 0.0 if (m and int(m.group(1)) in idxs) else 1.0

            freeze_flat, _ = ravel_pytree({k: jax.tree.map(
                lambda p, _k=k: jnp.full_like(p, _keep(_k)), sub)
                for k, sub in params.items()})
            if pad:
                freeze_flat = jnp.pad(freeze_flat, (0, pad))
            n_frozen = int(float(jnp.sum(1.0 - freeze_flat)))
            LOGGER.info(f"freeze: layers {sorted(idxs)} -> {n_frozen} params held")

        tx_inner = build_optimizer(p_flat, opt_name, lr0, momentum, decay, lr_at,
                                   momentum_schedule=momentum_at if warmup_steps else None,
                                   flat_mask=mask_flat)
        tx = optax.MultiSteps(tx_inner, every_k_schedule=accumulate)
        opt_state = tx.init(p_flat)
        LOGGER.info(
            f"{colorstr('optimizer:')} {opt_name}(lr={lr0}, momentum={momentum}) "
            f"decay={decay:.5g} accumulate={accumulate} warmup_steps={warmup_steps}"
        )

        criterion = self._build_criterion(task, args, kpt_shape)
        has_quality = "GF" in self.model.head_name or "E2E" in self.model.head_name
        is_rtdetr = self.model.head_name == "RTDETRDecoder"
        # end2end heads (v10Detect, E2EDetect, GFLHeadv2_E2E) use
        # E2EDetectLoss which consumes the full output DICT (it needs both
        # feats and one2one_feats) — must match _build_criterion's keying
        # exactly or the 2-arg __call__ gets 3 args and facade training
        # crashes for every end2end model (round-4 regression).
        is_e2e = bool(getattr(self.model, "end2end", False)) or "E2E" in self.model.head_name
        head_is_dict_loss = task in ("segment", "pose", "obb") or is_rtdetr or is_e2e
        # all label types ride the fused geometric warp (masks at mask_ratio
        # resolution, rboxes via corner projection + rect refit)
        geo_aug_ok = task in ("detect", "pose", "segment", "obb")
        hyp_dict = {k: v for k, v in vars(args).items() if isinstance(v, (int, float))}
        use_bf16 = bool(args.amp)

        @partial(jax.jit, static_argnames=("mosaic",), donate_argnums=(0,))
        def train_step(state, batch_dev, key, mosaic):
            p_flat, batch_stats, opt_state, ema_flat, step = state
            images, cls, bboxes, mask = (
                batch_dev["img"], batch_dev["cls"], batch_dev["bboxes"], batch_dev["mask_gt"]
            )
            if geo_aug_ok:
                kp = batch_dev.get("keypoints")
                sm = batch_dev.get("masks") if task == "segment" else None
                rb = batch_dev.get("rboxes") if task == "obb" else None
                aug = augment_batch(images, cls, bboxes, mask, key, imgsz, hyp_dict,
                                    mosaic=mosaic, keypoints=kp, masks=sm, rboxes=rb)
                if len(aug) == 5:
                    img01, acls, aboxes, amask, ex = aug
                    tgt = {"cls": acls, "bboxes": aboxes, "mask_gt": amask}
                    if not isinstance(ex, dict):
                        tgt["keypoints"] = ex  # pose back-compat return
                    else:
                        if "keypoints" in ex:
                            tgt["keypoints"] = ex["keypoints"]
                        if "masks" in ex:
                            tgt["masks"] = ex["masks"]
                        if "rboxes" in ex:
                            tgt["bboxes"] = ex["rboxes"]  # obb criterion consumes rboxes
                else:
                    img01, acls, aboxes, amask = aug
                    tgt = {"cls": acls, "bboxes": aboxes, "mask_gt": amask}
            else:
                img01 = images.astype(jnp.float32) / 255.0
                tgt = {"cls": cls, "bboxes": batch_dev.get("rboxes", bboxes), "mask_gt": mask}
                for extra in ("masks", "keypoints"):
                    if extra in batch_dev:
                        tgt[extra] = batch_dev[extra]
            if "img_weight" in batch_dev:  # padded final-batch duplicates train at 0 weight
                tgt["img_weight"] = batch_dev["img_weight"]
            x = img01.astype(jnp.bfloat16) if use_bf16 else img01

            # contrastive denoising group (RT-DETR training; reference
            # models/utils/ops.py:259) — generated inside the traced step so
            # group_size/num_groups stay static python ints
            dn = None
            if is_rtdetr:
                from edgeyolo_tpu.train.detr_loss import make_cdn_group

                dn = make_cdn_group(tgt["cls"], tgt["bboxes"], tgt["mask_gt"],
                                    self.model.nc, jax.random.fold_in(key, 7))
                tgt["dn"] = dn

            def loss_fn(pf):
                # AMP: bf16 compute copy of the f32 masters; cast-grads
                # accumulate back to f32 (nn.tasks.amp_cast)
                if fsdp_on:
                    # ZeRO forward: ONE all-gather of the raveled vector; the
                    # constraint's transpose makes the flat gradient arrive as
                    # a reduction of the per-device cotangents
                    pf = jax.lax.with_sharding_constraint(pf, rep_sh)
                p = unravel(pf)
                pc = amp_cast(p) if use_bf16 else p
                out, mut = self.model.apply(
                    {"params": pc, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats"], **({"dn": dn} if dn is not None else {}),
                )
                out = {k: ([f.astype(jnp.float32) for f in v] if isinstance(v, list)
                           else v.astype(jnp.float32) if hasattr(v, "astype") else v)
                       for k, v in out.items()}
                if head_is_dict_loss:
                    loss, items = criterion(out, tgt)
                else:
                    q = out.get("quality") if has_quality else None
                    loss, items = criterion(out["feats"], tgt, q)
                return loss, (items, mut["batch_stats"])

            (loss, (items, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_flat)
            if freeze_flat is not None:
                grads = grads * freeze_flat
            if fsdp_on:
                # ZeRO backward: land the flat grad sharded (reduce-scatter),
                # so momentum/update math runs on 1/n-sized shards
                grads = jax.lax.with_sharding_constraint(grads, flat_sh)
            updates, new_opt = tx.update(grads, opt_state, p_flat)
            if freeze_flat is not None:
                updates = updates * freeze_flat  # no decay drift on frozen params
            new_pflat = p_flat + updates
            if fsdp_on:
                new_pflat = jax.lax.with_sharding_constraint(new_pflat, flat_sh)
            # EMA advances only on completed optimizer updates: MultiSteps
            # emits a real update every `accumulate` micro-steps (mini_step
            # wraps to 0), matching the reference's optimizer_step-gated
            # ModelEMA.update (trainer.py:392,593). `step` therefore counts
            # real updates, keeping lr_at/decay-horizon semantics exact.
            did = (new_opt.mini_step == 0).astype(jnp.int32)
            upd = step + did
            d = 0.9999 * (1 - jnp.exp(-upd / 2000.0))
            d = jnp.where(did == 1, d, 1.0)
            new_ema = ema_flat * d + (1 - d) * new_pflat
            return (new_pflat, new_bs, new_opt, new_ema, upd), loss, items

        ema_flat = jnp.copy(p_flat)
        start_epoch = 0
        if args.resume:
            ck_path = Path(args.resume if isinstance(args.resume, str) else self.save_dir / "last.msgpack")
            if ck_path.exists():
                template = {"params": params, "batch_stats": batch_stats,
                            "ema": params, "updates": 0,
                            "epoch": 0, "best_fitness": 0.0}
                ck = serialization.from_bytes(template, ck_path.read_bytes())
                p_flat, _ = ravel_pytree(ck["params"])
                ema_flat, _ = ravel_pytree(ck["ema"])
                if pad:
                    p_flat = jnp.pad(p_flat, (0, pad))
                    ema_flat = jnp.pad(ema_flat, (0, pad))
                batch_stats = ck["batch_stats"]
                opt_path = ck_path.parent / (ck_path.stem + ".opt.msgpack")
                if opt_path.exists():
                    try:
                        opt_state = serialization.from_bytes(opt_state, opt_path.read_bytes())
                    except Exception as e:  # pre-flat-optimizer sidecar
                        LOGGER.warning(f"optimizer sidecar incompatible ({e}); fresh optimizer")
                start_epoch = int(ck["epoch"]) + 1
                self.best_fitness = float(ck["best_fitness"])
                LOGGER.info(f"resumed from {ck_path} at epoch {start_epoch} "
                            f"(best fitness {self.best_fitness:.4f})")
            else:
                LOGGER.warning(f"resume requested but {ck_path} not found; starting fresh")
        state = (p_flat, batch_stats, opt_state, ema_flat,
                 jnp.asarray(start_epoch * nb // max(accumulate, 1), jnp.int32))
        state = shard_flat_state(state, self.mesh, int(p_flat.size))

        key = jax.random.PRNGKey(int(args.seed))
        stopper = EarlyStopping(int(args.patience))
        csv_path = self.save_dir / "results.csv"
        t_start = time.time()
        stop = False
        self.run_callbacks("on_train_start")

        for epoch in range(start_epoch, epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            mosaic_on = (
                float(getattr(args, "mosaic", 1.0)) > 0
                and epoch < epochs - int(args.close_mosaic)
            )
            losses = []
            for bi, batch in enumerate(loader):
                key, sub = jax.random.split(key)
                keep = {k: v for k, v in batch.items() if k not in ("meta", "n_real")}
                B_full = batch["img"].shape[0]
                n_real = int(batch.get("n_real", B_full))
                # 1/0 weights: the final partial batch is padded with repeats
                # of its last item (dataset._collate) — without masking, that
                # item would train at (1 + pad_count) x the weight of any other
                keep["img_weight"] = np.concatenate(
                    [np.ones(n_real, np.float32), np.zeros(B_full - n_real, np.float32)])
                if n_proc > 1:  # assemble the global batch from per-host slices
                    sb = _dist.host_local_batch(keep, self.mesh)
                else:
                    sb = shard_batch(keep, self.mesh)
                # first 3 train-batch mosaics, augmented (reference
                # trainer.py:407-423 plot_training_samples)
                if args.plots and epoch == 0 and bi < 3 and geo_aug_ok:
                    try:
                        from edgeyolo_tpu.utils.plotting import plot_images

                        a_img, a_cls, a_box, a_msk, *_ = augment_batch(
                            jnp.asarray(batch["img"]), jnp.asarray(batch["cls"]),
                            jnp.asarray(batch["bboxes"]), jnp.asarray(batch["mask_gt"]),
                            sub, imgsz, hyp_dict, mosaic=mosaic_on)
                        plot_images(np.asarray(a_img), np.asarray(a_cls),
                                    np.asarray(a_box), np.asarray(a_msk),
                                    fname=self.save_dir / f"train_batch{bi}.jpg")
                    except Exception as e:
                        LOGGER.warning(f"train-batch plot failed: {e}")
                state, loss, items = train_step(state, sb, sub, mosaic_on)
                # keep device scalars; a float() here would block the host on
                # every step (~25 ms relay RTT per fetch through the tunnel).
                losses.append((items.get("box", items.get("l1", 0.0)),
                               items.get("cls", 0.0),
                               items.get("dfl", items.get("giou", 0.0))))
            mloss = (np.asarray(jax.device_get(losses), np.float32).mean(axis=0)
                     if losses else np.zeros(3))

            # validation with EMA params
            self.run_callbacks("on_train_epoch_end")
            fitness_val = None
            metrics_row = {}
            if args.val:
                if n_proc > 1:
                    # the validator's device_put path is single-process; on a
                    # real pod run val offline from the saved checkpoints
                    if epoch == start_epoch:
                        LOGGER.warning("multi-host run: skipping in-loop validation")
                else:
                    metrics_row = self._validate(state, data_cfg)
                    fitness_val = metrics_row.get("fitness", 0.0)
            self.last_metrics = dict(metrics_row)
            self.run_callbacks("on_fit_epoch_end")
            lr_now = float(lr_at(np.asarray(int(state[4]))))
            row = {
                "epoch": epoch,
                "time": round(time.time() - t_start, 2),
                "train/box_loss": round(float(mloss[0]), 5),
                "train/cls_loss": round(float(mloss[1]), 5),
                "train/dfl_loss": round(float(mloss[2]), 5),
                **{k: round(float(v), 5) for k, v in metrics_row.items()},
                "lr/pg0": round(lr_now, 6),
            }
            if self.is_main:  # results.csv is a rank-0 artifact on shared FS
                write_header = not csv_path.exists()
                with open(csv_path, "a", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=list(row))
                    if write_header:
                        w.writeheader()
                    w.writerow(row)
            LOGGER.info(
                f"epoch {epoch + 1}/{epochs} box {mloss[0]:.4f} cls {mloss[1]:.4f} "
                f"dfl {mloss[2]:.4f}" + (f" fitness {fitness_val:.4f}" if fitness_val is not None else "")
            )

            if fitness_val is not None and fitness_val >= self.best_fitness:
                self.best_fitness = fitness_val
                if self.is_main:
                    self._save_ckpt(state, epoch, "best")
            if self.is_main:  # ckpts are rank-0 artifacts (state is replicated)
                self._save_ckpt(state, epoch, "last")
            self.run_callbacks("on_model_save")
            sp = int(args.save_period)
            if sp > 0 and (epoch + 1) % sp == 0 and self.is_main:
                self._save_ckpt(state, epoch, f"epoch{epoch}")
            if stopper(epoch, fitness_val):
                stop = True
            if args.time and (time.time() - t_start) > float(args.time) * 3600:
                LOGGER.info("time budget reached, stopping")
                stop = True
            if stop:
                break

        # adopt final (EMA) weights into the model handle
        params_f = jax.device_get(self._unravel(state[0]))
        ema_f = jax.device_get(self._unravel(state[3]))
        batch_stats_f = jax.device_get(state[1])
        self.model.variables = {"params": ema_f, "batch_stats": batch_stats_f}
        self.raw_variables = {"params": params_f, "batch_stats": batch_stats_f}
        self.run_callbacks("on_train_end")
        self.run_callbacks("teardown")
        LOGGER.info(
            f"training done in {(time.time() - t_start) / 3600:.3f}h, "
            f"best fitness {self.best_fitness:.4f}, results in {self.save_dir}"
        )
        return self.best_fitness

    # -- helpers ---------------------------------------------------------------
    def _build_criterion(self, task: str, args, kpt_shape):
        from edgeyolo_tpu.train.loss import (
            E2EDetectLoss,
            OBBLoss,
            PoseLoss,
            SegmentationLoss,
        )

        if task == "segment":
            return SegmentationLoss(self.model, hyp=args)
        if task == "pose":
            return PoseLoss(self.model, hyp=args, kpt_shape=kpt_shape,
                            pose_gain=float(args.pose), kobj_gain=float(args.kobj))
        if task == "obb":
            return OBBLoss(self.model, hyp=args)
        if self.model.head_name == "RTDETRDecoder":
            from edgeyolo_tpu.train.detr_loss import RTDETRDetectionLoss

            return RTDETRDetectionLoss(self.model)
        # key on the end2end attribute, NOT the head-name string: v10Detect is
        # end2end without "E2E" in its name (reference tasks.py:411-413
        # `E2EDetectLoss(self) if getattr(self, "end2end", False) else ...`);
        # name-matching silently trained v10's one2one branch with zero
        # gradient (the one2many-only criterion) — 150 epochs to mAP 0.0000
        if getattr(self.model, "end2end", False) or "E2E" in self.model.head_name:
            return E2EDetectLoss(self.model, hyp=args)
        return DetectionLoss(self.model, hyp=args)

    def _validate(self, state, data_cfg) -> dict:
        from edgeyolo_tpu.cfg import get_cfg
        from edgeyolo_tpu.engine.validator import (
            DetectionValidator,
            OBBValidator,
            PoseValidator,
            SegmentationValidator,
        )

        _, batch_stats, _, ema_flat, _ = state
        ema = self._unravel(ema_flat)
        if not hasattr(self, "_validator"):
            vargs = get_cfg(overrides={
                "mode": "val", "data": self.args.data, "imgsz": self.args.imgsz,
                "batch": self.args.batch, "conf": 0.001, "iou": 0.7,
                "max_det": 300, "plots": False, "task": self.args.task,
                "single_cls": bool(getattr(self.args, "single_cls", False)),
            })
            vcls = {"segment": SegmentationValidator, "pose": PoseValidator,
                    "obb": OBBValidator}.get(getattr(self.model, "task", "detect"), DetectionValidator)
            self._validator = vcls(vargs, save_dir=self.save_dir / "val")
        variables = {"params": ema, "batch_stats": batch_stats}
        return self._validator(self.model, data=data_cfg, variables=variables,
                               batch_size=int(self.args.batch), max_nms=4096)

    def _save_ckpt(self, state, epoch: int, name: str):
        p_flat, batch_stats, opt_state, ema_flat, step = state
        params = jax.device_get(self._unravel(p_flat))
        ema = jax.device_get(self._unravel(ema_flat))
        batch_stats, opt_state, step = jax.device_get((batch_stats, opt_state, step))
        ckpt = {
            "params": params,
            "batch_stats": batch_stats,
            "ema": ema,
            "updates": int(step),
            "epoch": epoch,
            "best_fitness": float(self.best_fitness),
        }
        if name == "last":  # optimizer sidecar enables exact resume
            (self.save_dir / "last.opt.msgpack").write_bytes(serialization.to_bytes(opt_state))
        self.save_dir.mkdir(parents=True, exist_ok=True)
        blob = serialization.to_bytes(ckpt)
        (self.save_dir / f"{name}.msgpack").write_bytes(blob)
        meta = {
            "epoch": epoch, "best_fitness": float(self.best_fitness),
            "model_yaml": self.model.yaml.get("yaml_file", ""),
            "task": getattr(self.model, "task", "detect"),
            "scale": self.model.scale, "nc": self.model.nc,
            "names": self.model.names,
            "train_args": {k: v for k, v in vars(self.args).items()
                           if isinstance(v, (int, float, str, bool, type(None)))},
        }
        if not meta["model_yaml"]:  # dict-built model: embed the cfg itself
            meta["model_cfg"] = {k: v for k, v in self.model.yaml.items()
                                 if isinstance(v, (int, float, str, bool, list, dict, type(None)))}
        (self.save_dir / f"{name}.json").write_text(json.dumps(meta, default=str))


def load_checkpoint(model, path: str | Path, use_ema: bool = True):
    """Restore weights from a trainer checkpoint into a model handle."""
    path = Path(path)
    if model.variables is None:
        model.init(0, imgsz=64)
    template = {
        "params": model.variables["params"],
        "batch_stats": model.variables.get("batch_stats", {}),
        "ema": model.variables["params"],
        "updates": 0,
        "epoch": 0,
        "best_fitness": 0.0,
    }
    ckpt = serialization.from_bytes(template, path.read_bytes())
    model.variables = {
        "params": ckpt["ema"] if use_ema else ckpt["params"],
        "batch_stats": ckpt["batch_stats"],
    }
    meta_p = path.with_suffix(".json")
    if meta_p.exists():
        meta = json.loads(meta_p.read_text())
        model.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
    return ckpt
