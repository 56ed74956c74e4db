"""The YOLO model facade: load spec/checkpoint, dispatch train/val/predict/
track/export/benchmark via the task map.

Behavioral spec: ultralytics/engine/model.py:31-1105 (mode dispatch, arg
precedence overrides < method kwargs, task_map extension point
models/yolo/model.py:26-60).
"""

from __future__ import annotations

from pathlib import Path

from edgeyolo_tpu.cfg import get_cfg, get_save_dir
from edgeyolo_tpu.nn.tasks import (
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
    guess_model_task,
)
from edgeyolo_tpu.utils import LOGGER


class YOLO:
    """User-facing handle: YOLO('yolo11n.yaml') or YOLO('path/to/last.msgpack')."""

    def __init__(self, model: str = "yolo11n.yaml", task: str | None = None, verbose: bool = False):
        self.overrides: dict = {}
        self.predictor = None
        self.ckpt_path = None
        model = str(model)
        if model.endswith(".msgpack"):
            self._load_checkpoint(model, task)
        elif model.endswith(".pt"):
            self._load_torch_checkpoint(model, task)
        else:
            from edgeyolo_tpu.nn.tasks import WorldModel, yaml_model_load as _yml

            d = _yml(model)  # load once: task guess, World probe, and build
            self.task = task or guess_model_task(d)
            cls = self.task_map[self.task]["model"]
            if "World" in str(d.get("head", [[None, None, ""]])[-1][2]):
                cls = WorldModel
            self.model = cls(d, verbose=verbose)
            self.model_name = model
        self.model.names = getattr(self.model, "names", {})

    # -- task map (the reference's single extension point) ---------------------
    @property
    def task_map(self):
        from edgeyolo_tpu.engine.classify import ClassificationPredictor, ClassificationValidator
        from edgeyolo_tpu.engine.predictor import (
            DetectionPredictor,
            OBBPredictor,
            PosePredictor,
            SegmentationPredictor,
        )
        from edgeyolo_tpu.engine.validator import (
            DetectionValidator,
            OBBValidator,
            PoseValidator,
            SegmentationValidator,
        )
        from edgeyolo_tpu.train.classify import ClassificationTrainer
        from edgeyolo_tpu.train.trainer import DetectionTrainer

        return {
            "detect": {
                "model": DetectionModel,
                "trainer": DetectionTrainer,
                "validator": DetectionValidator,
                "predictor": DetectionPredictor,
            },
            "segment": {"model": SegmentationModel, "trainer": DetectionTrainer,
                        "validator": SegmentationValidator, "predictor": SegmentationPredictor},
            "pose": {"model": PoseModel, "trainer": DetectionTrainer,
                     "validator": PoseValidator, "predictor": PosePredictor},
            "obb": {"model": OBBModel, "trainer": DetectionTrainer,
                    "validator": OBBValidator, "predictor": OBBPredictor},
            "classify": {"model": ClassificationModel, "trainer": ClassificationTrainer,
                         "validator": ClassificationValidator, "predictor": ClassificationPredictor},
        }

    def _load_checkpoint(self, path: str, task: str | None):
        import json

        meta_p = Path(path).with_suffix(".json")
        if not meta_p.exists():
            raise FileNotFoundError(f"checkpoint metadata {meta_p} not found")
        meta = json.loads(meta_p.read_text())
        model_yaml = meta.get("model_yaml") or "yolo11n.yaml"
        from edgeyolo_tpu.nn.tasks import WorldModel, yaml_model_load

        # save_pretrained/trainer embed the yaml dict when the model wasn't
        # built from a named yaml (e.g. torch .pt imports)
        d = dict(meta["model_cfg"]) if meta.get("model_cfg") else yaml_model_load(model_yaml)
        if meta.get("scale"):
            d["scale"] = meta["scale"]
        if meta.get("nc"):
            d["nc"] = int(meta["nc"])
        # a segment/pose/... checkpoint loaded as detect would silently parse
        # its head output wrong — derive the task from the sidecar or the cfg
        self.task = (task or meta.get("task")
                     or (meta.get("train_args") or {}).get("task")
                     or guess_model_task(d))
        cls = self.task_map[self.task]["model"]
        if "World" in str(d.get("head", [[None, None, ""]])[-1][2]):
            cls = WorldModel
        self.model = cls(d)
        from edgeyolo_tpu.train.trainer import load_checkpoint

        load_checkpoint(self.model, path)
        self.ckpt_path = path
        self.model_name = model_yaml
        self.overrides.update({k: v for k, v in (meta.get("train_args") or {}).items()
                               if k in ("imgsz", "task", "single_cls")})

    def _load_torch_checkpoint(self, path: str, task: str | None):
        """Load a reference torch .pt checkpoint: rebuild from its embedded
        yaml, then convert weights (utils/torch_convert.py). Reference:
        nn/tasks.py:932 attempt_load_one_weight."""
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        tm = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        d = dict(getattr(tm, "yaml", None) or {})
        if not d:
            raise ValueError(f"{path}: no model yaml embedded; pass the matching .yaml instead")
        self.task = task or guess_model_task(d)
        cls = self.task_map[self.task]["model"]
        self.model = cls(d)
        import jax
        import jax.numpy as jnp

        from edgeyolo_tpu.utils.torch_convert import convert_state_dict

        self.model.init(0, imgsz=int(d.get("imgsz", 640)) if isinstance(d.get("imgsz"), int) else 640)
        sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
        nv, rep = convert_state_dict(sd, self.model.variables, strict=False)
        dropped = [u for u in rep["unused"] if "dfl" not in u]
        if rep["missing"] or dropped:
            LOGGER.warning(f"torch import: {len(rep['missing'])} missing, {len(dropped)} unused keys")
        self.model.variables = jax.tree.map(jnp.asarray, nv)
        if hasattr(tm, "names"):
            n = tm.names
            self.model.names = dict(enumerate(n)) if isinstance(n, (list, tuple)) else dict(n)
        self.ckpt_path = path
        self.model_name = path

    # -- lifecycle helpers -------------------------------------------------------
    def _ensure_init(self, imgsz: int = 640):
        if self.model.variables is None:
            self.model.init(0, imgsz=int(imgsz))

    @property
    def names(self):
        return self.model.names

    def info(self, verbose: bool = True):
        self._ensure_init()
        return self.model.info(verbose)

    # -- callbacks (reference Model.add_callback/reset_callbacks:905-940) -----
    def add_callback(self, event: str, func):
        """Register a hook fired by the trainer at the named event; the full
        event table lives in utils/callbacks.EVENTS."""
        from edgeyolo_tpu.utils.callbacks import EVENTS, get_default_callbacks

        if not hasattr(self, "callbacks"):
            self.callbacks = get_default_callbacks()
        if event not in EVENTS:
            raise KeyError(f"unknown callback event '{event}'; valid: {EVENTS}")
        self.callbacks[event].append(func)

    def reset_callbacks(self):
        from edgeyolo_tpu.utils.callbacks import get_default_callbacks

        self.callbacks = get_default_callbacks()

    # -- modes -------------------------------------------------------------------
    def train(self, **kwargs):
        args = get_cfg(overrides={**self.overrides, "mode": "train",
                                  "model": self.model_name, "task": self.task, **kwargs})
        if not args.data:
            raise ValueError("train() requires data=<dataset.yaml>")
        # a yaml-built model with no weights yet adapts its head to the
        # dataset's class count, like the reference trainer's
        # get_model(cfg, nc=data['nc']) (models/yolo/detect/train.py:86-91);
        # once weights exist the trainer's strict nc check stands
        if self.model.variables is None and self.task == "classify":
            # reference ClassificationTrainer builds the model with the
            # DATASET's nc (models/yolo/classify/train.py:59-64), so a
            # yaml zoo file's nc=1000 never reaches training
            try:
                from edgeyolo_tpu.data.classify import check_cls_dataset

                nc = int(check_cls_dataset(args.data)["nc"])
            except Exception:
                nc = None
            if nc and nc != self.model.nc:
                LOGGER.info(f"rebuilding classify head for dataset nc={nc} "
                            f"(was {self.model.nc})")
                d = dict(self.model.yaml)
                d["nc"] = nc
                self.model = type(self.model)(d)
        if self.model.variables is None and self.task != "classify":
            try:
                from edgeyolo_tpu.data.dataset import check_det_dataset

                data_cfg = check_det_dataset(args.data)
                nc = int(data_cfg["nc"])
            except Exception:
                data_cfg, nc = {}, None
            # pose: a data-level kpt_shape overrides the yaml literal, like
            # the reference PoseTrainer's get_model(...,
            # data_kpt_shape=data['kpt_shape']) (models/yolo/pose/train.py:41)
            kpt = data_cfg.get("kpt_shape") if self.task == "pose" else None
            kpt = tuple(int(x) for x in kpt) if kpt else None
            cur_kpt = tuple(self.model.yaml.get("kpt_shape", (17, 3)))
            if (nc and nc != self.model.nc) or (kpt and kpt != cur_kpt):
                LOGGER.info(f"rebuilding model head for dataset nc={nc} "
                            f"(was {self.model.nc})"
                            + (f", kpt_shape={list(kpt)} (was {list(cur_kpt)})"
                               if kpt and kpt != cur_kpt else ""))
                d = dict(self.model.yaml)
                d["nc"] = nc or self.model.nc
                if kpt:
                    d["kpt_shape"] = list(kpt)
                self.model = type(self.model)(d)  # trainer sets dataset names
        trainer_cls = self.task_map[self.task]["trainer"]
        save_dir = get_save_dir(args, name=args.name or "train")
        self._ensure_init(args.imgsz)
        # pretrained=<path> seeds the (possibly yaml-built) model with those
        # weights before training, shape-intersected — the reference's
        # setup_model `elif isinstance(self.args.pretrained, (str, Path)):
        # attempt_load_one_weight(...)` (engine/trainer.py:580-582).
        # bool pretrained is advisory there (pretrained-download gating) and
        # a no-op in this offline image.
        pre = getattr(args, "pretrained", None)
        if isinstance(pre, (str, Path)) and str(pre) not in ("True", "False", ""):
            LOGGER.info(f"loading pretrained weights from {pre}")
            self.load(pre)
        trainer = trainer_cls(self.model, args, save_dir=save_dir,
                              callbacks=getattr(self, "callbacks", None))
        self.trainer = trainer
        best = trainer.train()
        self.overrides["imgsz"] = args.imgsz
        return best

    def val(self, **kwargs):
        args = get_cfg(overrides={**self.overrides, "mode": "val", "task": self.task, **kwargs})
        if not args.data:
            raise ValueError("val() requires data=<dataset.yaml>")
        validator_cls = self.task_map[self.task]["validator"]
        save_dir = get_save_dir(args, name=args.name or "val")
        self._ensure_init(args.imgsz)
        validator = validator_cls(args, save_dir=save_dir)
        return validator(self.model)

    def predict(self, source, stream: bool = False, **kwargs):
        args = get_cfg(overrides={**self.overrides, "mode": "predict", "task": self.task, **kwargs})
        predictor_cls = self.task_map[self.task]["predictor"]
        self._ensure_init(args.imgsz)
        # cache the predictor per effective-args so repeated calls (incl. the
        # frame-by-frame track(persist=True) loop) reuse the compiled device
        # program instead of re-jitting (reference caches its predictor too,
        # engine/model.py:554)
        args_key = repr(sorted(vars(args).items(), key=lambda kv: kv[0]))
        if self.predictor is None or args_key != getattr(self, "_predictor_args", None):
            save_dir = get_save_dir(args, name=args.name or "predict")
            self.predictor = predictor_cls(args, save_dir=save_dir)
            self._predictor_args = args_key
        if stream:
            return self.predictor.stream(self.model, source)
        return self.predictor(self.model, source)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def embed(self, source, stream: bool = False, **kwargs):
        """One pooled feature vector per image (reference Model.embed:467-499:
        wraps predict with embed=[...], default = second-to-last layer; each
        tapped layer is global-avg-pooled and the taps are concatenated)."""
        import jax
        import numpy as np

        args = get_cfg(overrides={**self.overrides, "mode": "predict",
                                  "task": self.task, **kwargs})
        self._ensure_init(args.imgsz)
        layers = tuple(kwargs.get("embed") or [len(self.model.spec) - 2])
        from edgeyolo_tpu.data.letterbox import letterbox
        from edgeyolo_tpu.engine.predictor import _iter_source

        model = self.model
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False, embed=layers))

        def gen():
            import jax.numpy as jnp

            for _path, img0 in _iter_source(source):
                img, _r, _pads = letterbox(img0, int(args.imgsz), scaleup=True)
                x = jnp.asarray(img[None], jnp.float32) / 255.0
                yield np.asarray(jax.device_get(fwd(model.variables, x)))[0]

        return gen() if stream else list(gen())

    def fuse(self):
        """Fold conv+BN into single convs (reference Model.fuse / BaseModel.fuse)."""
        self._ensure_init()
        self.model.fuse()
        return self

    def save(self, filename: str | Path = "model.msgpack"):
        """Write this model as a standalone checkpoint (.msgpack + .json
        sidecar) that YOLO(<path>) reloads (reference Model.save:393)."""
        import json

        from flax import serialization

        self._ensure_init()
        dst = Path(filename)
        dst.parent.mkdir(parents=True, exist_ok=True)
        v = self.model.variables
        ckpt = {"params": v["params"], "batch_stats": v.get("batch_stats", {}),
                "ema": v["params"], "updates": 0, "epoch": 0, "best_fitness": 0.0}
        dst.write_bytes(serialization.to_bytes(ckpt))
        yaml_name = self.model.yaml.get("yaml_file", "") or str(self.model_name)
        if not yaml_name.endswith((".yaml", ".yml")):
            yaml_name = ""  # torch/.msgpack imports: embed the cfg dict instead
        meta = {"model_yaml": yaml_name,
                "model_cfg": None if yaml_name else
                {k: val for k, val in self.model.yaml.items() if k != "yaml_file"},
                "scale": getattr(self.model, "scale", ""), "nc": self.model.nc,
                "names": self.model.names, "task": self.task}
        dst.with_suffix(".json").write_text(json.dumps(meta, default=str))
        return dst

    def load(self, weights: str | Path):
        """Load weights into the CURRENT architecture, keeping only shape-
        matching leaves (reference Model.load:362 / intersect_dicts,
        nn/tasks.py:286-299). Accepts .msgpack or reference torch .pt."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        weights = str(weights)
        self._ensure_init()
        if weights.endswith(".pt"):
            import torch

            from edgeyolo_tpu.utils.torch_convert import convert_state_dict

            ckpt = torch.load(weights, map_location="cpu", weights_only=False)
            tm = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
            sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
            nv, rep = convert_state_dict(sd, self.model.variables, strict=False)
            if rep["missing"]:
                LOGGER.warning(f"load: {len(rep['missing'])} keys kept at current values")
            self.model.variables = jax.tree.map(jnp.asarray, nv)
            return self
        donor = YOLO(weights, task=self.task)
        cur = self.model.variables
        flat_c = jax.tree_util.tree_flatten_with_path(cur)[0]
        flat_n = dict(jax.tree_util.tree_flatten_with_path(donor.model.variables)[0])
        kept = skipped = 0
        merged = []
        for p, c in flat_c:
            n = flat_n.get(p)
            if n is not None and getattr(n, "shape", None) == getattr(c, "shape", ()):
                merged.append(jnp.asarray(np.asarray(n)))
                kept += 1
            else:
                merged.append(c)
                skipped += 1
        self.model.variables = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(cur), merged)
        LOGGER.info(f"load: transferred {kept} tensors, kept {skipped} (shape mismatch/absent)")
        return self

    def track(self, source, persist: bool = False, **kwargs):
        """Tracked prediction stream. persist=True keeps the tracker (and its
        ids) alive across calls — the reference's frame-by-frame pattern
        `for f in frames: model.track(f, persist=True)` (track.py:18-50)."""
        from edgeyolo_tpu.trackers.track import make_tracker, track_stream

        kwargs.setdefault("conf", 0.1)
        cfg = kwargs.pop("tracker", "bytetrack")
        if not persist or getattr(self, "_tracker", None) is None:
            self._tracker = make_tracker(cfg)
        results = self.predict(source, stream=True, **kwargs)
        return track_stream(results, tracker=self._tracker)

    def export(self, **kwargs):
        from edgeyolo_tpu.export.exporter import Exporter

        args = get_cfg(overrides={**self.overrides, "mode": "export", "task": self.task, **kwargs})
        self._ensure_init(args.imgsz)
        out_dir = Path(args.project) / (args.name or "export") if args.project \
            else Path("runs/export")
        return Exporter(args)(self.model, out_dir=out_dir)

    def benchmark(self, **kwargs):
        from edgeyolo_tpu.utils.benchmarks import benchmark as bench_fn

        return bench_fn(self, **kwargs)

    # -- Hugging Face Hub interop ---------------------------------------------
    # The reference fork bases its facade on PyTorchModelHubMixin
    # (engine/model.py:11,31) for save_pretrained/from_pretrained/push_to_hub.
    # Same surface here, natively: the snapshot layout is the trainer
    # checkpoint schema (model.msgpack + model.json sidecar, so
    # YOLO('<dir>/model.msgpack') loads it too) plus an HF config.json and a
    # minimal model card. Network paths use huggingface_hub primitives when
    # the package is importable (probed, never assumed).

    def save_pretrained(self, save_directory: str | Path, card: bool = True) -> Path:
        """Write an HF-Hub-layout snapshot of this model to a local directory."""
        import json

        save_dir = Path(save_directory)
        save_dir.mkdir(parents=True, exist_ok=True)
        self.save(save_dir / "model.msgpack")  # ckpt + model.json sidecar
        meta = json.loads((save_dir / "model.json").read_text())
        (save_dir / "config.json").write_text(
            json.dumps({"library_name": "edgeyolo_tpu", **meta}, default=str))
        if card and not (save_dir / "README.md").exists():
            (save_dir / "README.md").write_text(
                f"---\nlibrary_name: edgeyolo_tpu\npipeline_tag: object-detection\n"
                f"tags:\n- {self.task}\n- jax\n---\n\n"
                f"# {Path(str(self.model_name)).stem}\n\n"
                f"edgeyolo_tpu {self.task} model ({self.model.nc} classes). Load with\n"
                f"`YOLO.from_pretrained(\"<repo-or-dir>\")`.\n")
        return save_dir

    @classmethod
    def from_pretrained(cls, repo_id: str, task: str | None = None,
                        revision: str | None = None, **download_kwargs) -> "YOLO":
        """Load from a local save_pretrained dir or a Hub repo id."""
        import json

        p = Path(repo_id)
        if not p.is_dir():
            try:
                from huggingface_hub import snapshot_download
            except ImportError as e:
                raise ImportError(
                    "from_pretrained with a repo id requires the huggingface_hub "
                    "package (probed, not importable); pass a local directory instead"
                ) from e
            p = Path(snapshot_download(repo_id, revision=revision, **download_kwargs))
        cfg_p = p / "config.json"
        cfg = json.loads(cfg_p.read_text()) if cfg_p.exists() else {}
        return cls(str(p / "model.msgpack"), task=task or cfg.get("task"))

    def push_to_hub(self, repo_id: str, private: bool = True, token: str | None = None,
                    commit_message: str = "Upload edgeyolo_tpu model"):
        """save_pretrained into a temp dir, then upload it as a Hub repo."""
        try:
            from huggingface_hub import HfApi
        except ImportError as e:
            raise ImportError("push_to_hub requires the huggingface_hub package "
                              "(probed, not importable)") from e
        import tempfile

        api = HfApi(token=token)
        repo = api.create_repo(repo_id, private=private, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            self.save_pretrained(td)
            return api.upload_folder(repo_id=repo.repo_id, folder_path=td,
                                     commit_message=commit_message)

    def tune(self, iterations: int = 10, **kwargs):
        """Evolutionary hyperparameter search (reference Model.tune:817)."""
        from edgeyolo_tpu.engine.tuner import Tuner

        model_name, task = self.model_name, self.task
        nc = self.model.nc
        # rebuild from the model's own cfg dict — model_name may be a .pt /
        # .msgpack path that yaml_model_load cannot parse
        cfg = dict(self.model.yaml)

        def factory():
            m = YOLO.__new__(YOLO)
            m.overrides, m.predictor, m.ckpt_path = {}, None, None
            m.task, m.model_name = task, model_name
            d = dict(cfg)
            d["nc"] = nc
            m.model = type(self.model)(d)
            m.model.names = getattr(self.model, "names", {})
            return m

        tuner = Tuner(vars(get_cfg(overrides={})), save_dir=get_save_dir(
            get_cfg(overrides={"mode": "train", "task": self.task}), name="tune"))
        return tuner(factory, iterations=iterations, **kwargs)
