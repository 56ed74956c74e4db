"""Numerical forward parity vs the torch reference (random-init weights).

The strongest correctness check we have: instantiate the reference model in
torch (cpu), export its state_dict + eval-mode forward on a fixed input,
convert the weights with utils/torch_convert.py, and assert our jitted
forward reproduces the reference to fp32 tolerance. Covers the whole graph:
every conv/BN/attention/DWT path, DFL decode, and anchor grids.

Skipped when the reference checkout is not mounted at /root/reference.
Dumps are cached in /tmp/ptparity across runs.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parents[1]
CACHE = Path("/tmp/ptparity")

pytestmark = [pytest.mark.skipif(not REF.exists(), reason="reference checkout not mounted"), pytest.mark.slow]

CASES = [
    # (cache name, reference cfg, our cfg, box tol in px @64)
    ("yolo11n", "yolo11n.yaml", "yolo11n", 5e-4),
    ("la", "ultralytics/cfg/models/11/yolo11-lineattention.yaml", "yolo11-lineattention", 5e-3),
    ("wav", "ultralytics/cfg/models/11/yolo11-DSC3K2_Wavelet.yaml", "yolo11-dsc3k2-wavelet", 5e-4),
    # the full EdgeLine flagship (wavelet neck + linear attention + GFLv2
    # quality head); reference yolo11-test.yaml == our edgeline-yolo
    ("gf2", "ultralytics/cfg/models/11/yolo11-test.yaml", "edgeline-yolo", 5e-3),
    # family coverage for modules the 4 cases above never touch:
    ("v5n", "yolov5n.yaml", "yolov5n", 5e-4),           # C3, stem-6 conv
    ("v9t", "ultralytics/cfg/models/v9/yolov9t.yaml", "yolov9t", 5e-3),  # ELAN1/AConv/ADown/SPPELAN/RepNCSPELAN4
    ("v12n", "yolov12n.yaml", "yolov12n", 5e-3),        # A2C2f area attention
    ("v13n", "yolov13n.yaml", "yolov13n", 5e-3),        # HyperACE/FullPAD_Tunnel/DSC3K2
    ("v6n", "yolov6n.yaml", "yolov6n", 5e-4),           # yaml `activation: nn.ReLU()` override
    ("v3t", "yolov3-tiny.yaml", "yolov3-tiny", 5e-4),   # plain conv/maxpool lineage
]


def _dump(name: str, ref_cfg: str) -> Path:
    out = CACHE / f"ref_{name}.npz"
    if out.exists():
        return out
    CACHE.mkdir(exist_ok=True)
    env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
    subprocess.run(
        [sys.executable, str(REPO / "tools/dump_reference_forward.py"), ref_cfg, str(out), "64"],
        cwd=REF, env=env, check=True, capture_output=True, text=True)
    return out


@pytest.mark.parametrize("name,ref_cfg,our_cfg,tol", CASES, ids=[c[0] for c in CASES])
def test_forward_parity(name, ref_cfg, our_cfg, tol):
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import DetectionModel
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    z = np.load(_dump(name, ref_cfg))
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    m = DetectionModel(our_cfg, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    nv, rep = convert_state_dict(sd, v, strict=True)
    assert [u for u in rep["unused"] if "dfl" not in u] == []  # full coverage both ways

    x = z["__input__"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    out = m.apply(jax.tree.map(jnp.asarray, nv), jnp.asarray(x), train=False)
    pred = np.asarray((out[0] if isinstance(out, tuple) else out)["pred"])
    ref = z["__pred__"].transpose(0, 2, 1)
    assert pred.shape == ref.shape
    d = np.abs(pred - ref)
    assert float(d[..., :4].max()) < tol, f"box decode diverged: {d[..., :4].max()}"
    assert float(d[..., 4:].max()) < 1e-4, f"cls scores diverged: {d[..., 4:].max()}"


def test_pt_facade_roundtrip(tmp_path):
    """YOLO('model.pt') loads a torch checkpoint end-to-end."""
    _dump("yolo11n", "yolo11n.yaml")
    pt = CACHE / "yolo11n_random.pt"
    if not pt.exists():
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import torch; from ultralytics.nn.tasks import DetectionModel\n"
            "torch.manual_seed(0)\n"
            "m = DetectionModel('yolo11n.yaml', ch=3, nc=80, verbose=False).eval().float()\n"
            f"torch.save({{'model': m}}, r'{pt}')\n")
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)

    # unpickling the checkpoint needs the reference package importable
    sys.path.insert(0, str(REPO / "tools/ref_shim"))
    sys.path.insert(0, str(REF))
    import importlib.metadata as _md
    _orig_version = _md.version
    _md.version = lambda n: "0.17.2" if n == "torchvision" else _orig_version(n)
    try:
        from edgeyolo_tpu.engine.model import YOLO

        y = YOLO(str(pt))
        assert y.task == "detect"
        z = np.load(CACHE / "ref_yolo11n.npz")
        import jax.numpy as jnp

        x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
        out = y.model.apply(y.model.variables, x, train=False)
        pred = np.asarray((out[0] if isinstance(out, tuple) else out)["pred"])
        ref = z["__pred__"].transpose(0, 2, 1)
        assert float(np.abs(pred - ref).max()) < 5e-4
    finally:
        _md.version = _orig_version
        sys.path.remove(str(REPO / "tools/ref_shim"))
        sys.path.remove(str(REF))


def test_sam_forward_parity():
    """Full SAM stack vs the torch reference at random init: ViT encoder,
    prompt encoder, two-way mask decoder (small config, same code paths as
    vit_b: windowed+global blocks, rel-pos, 14px windows over an 8x8 grid)."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.sam import SAMModel
    from edgeyolo_tpu.utils.torch_convert import convert_sam_state_dict

    out = CACHE / "ref_sam.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        subprocess.run([sys.executable, str(REPO / "tools/dump_reference_sam.py"), str(out)],
                       cwd=REF, env=env, check=True, capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}

    m = SAMModel(img_size=128, encoder_dim=64, encoder_depth=4, encoder_heads=2,
                 global_idx=(1, 3))
    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    # reference pads point prompts with a (0,0)/-1 slot when no box is given
    pts = np.concatenate([z["__pts__"] + 0.5, np.zeros((1, 1, 2), np.float32)], 1) / 128.0
    labs = np.concatenate([z["__labs__"], -np.ones((1, 1), np.float32)], 1).astype(np.int32)
    v = m.init(jax.random.PRNGKey(0), x, jnp.asarray(pts), jnp.asarray(labs))
    nv, rep = convert_sam_state_dict(sd, v, strict=True)
    # only the mask-input stem (unused: no mask prompt here) may stay torch-side
    assert all("mask_downscaling" in u for u in rep["unused"])

    nv = jax.tree.map(jnp.asarray, nv)
    emb = m.apply(nv, x, method="encode")
    assert float(np.abs(np.asarray(emb) - z["__emb__"].transpose(0, 2, 3, 1)).max()) < 1e-4
    masks, iou = m.apply(nv, emb, jnp.asarray(pts), jnp.asarray(labs), method="prompt")
    assert float(np.abs(np.asarray(masks) - z["__masks__"]).max()) < 1e-4
    assert float(np.abs(np.asarray(iou) - z["__iou__"]).max()) < 1e-5


def test_rtdetr_forward_parity():
    """rtdetr-l vs the torch reference at random init. Scores match
    elementwise; boxes match as a SET — equal-scored anchors at random init
    tie-break differently between torch.topk and lax.top_k, permuting rows
    (~10% of 300 queries; irrelevant for set prediction and gone with
    trained weights)."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import RTDETRDetectionModel
    from edgeyolo_tpu.utils.torch_convert import convert_rtdetr_state_dict

    out = CACHE / "ref_rtdetr.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.tasks import RTDETRDetectionModel\n"
            "m = RTDETRDetectionModel('rtdetr-l.yaml', ch=3, nc=80, verbose=False).eval().float()\n"
            "x = torch.from_numpy(np.random.RandomState(11).rand(1,3,256,256).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "p = y[0] if isinstance(y, (list, tuple)) else y\n"
            f"np.savez(r'{out}', __pred__=p.numpy(), __input__=x.numpy(),"
            " **{k: v.detach().numpy() for k, v in m.state_dict().items()})\n")
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}

    m = RTDETRDetectionModel("rtdetr-l", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=256)
    nv, rep = convert_rtdetr_state_dict(sd, v, strict=True)
    assert rep["unused"] == []

    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    out_ = m.apply(jax.tree.map(jnp.asarray, nv), x, train=False)
    pred = np.asarray((out_[0] if isinstance(out_, tuple) else out_)["pred"])[0]
    ref = z["__pred__"][0]
    assert pred.shape == ref.shape
    # permutation-tolerant set comparison (greedy nearest match)
    used = np.zeros(len(ref), bool)
    worst = 0.0
    for row in pred:
        d = np.abs(row[None] - ref).max(-1)
        d[used] = 1e9
        j = d.argmin()
        used[j] = True
        worst = max(worst, float(d[j]))
    assert worst < 1e-4, f"rtdetr outputs diverge beyond tie-permutation: {worst}"


TASK_CASES = [
    # (cache name, reference cfg, our cfg, task, model class name)
    ("seg", "yolov8n-seg.yaml", "yolov8n-seg", "segment", "SegmentationModel"),
    ("pose", "yolov8n-pose.yaml", "yolov8n-pose", "pose", "PoseModel"),
    ("obb", "yolov8n-obb.yaml", "yolov8n-obb", "obb", "OBBModel"),
]


@pytest.mark.parametrize("name,ref_cfg,our_cfg,task,cls_name", TASK_CASES,
                         ids=[c[0] for c in TASK_CASES])
def test_task_head_forward_parity(name, ref_cfg, our_cfg, task, cls_name):
    """Segment (incl. Proto transpose-conv), Pose (keypoint decode) and OBB
    (angle decode) heads vs the torch reference at random init."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn import tasks
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    out = CACHE / f"ref_{name}.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        subprocess.run([sys.executable, str(REPO / "tools/dump_reference_task_forward.py"),
                        ref_cfg, task, str(out), "64"],
                       cwd=REF, env=env, check=True, capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    m = getattr(tasks, cls_name)(our_cfg, verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    nv, rep = convert_state_dict(sd, v, strict=True)
    assert [u for u in rep["unused"] if "dfl" not in u] == []

    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    o = m.apply(jax.tree.map(jnp.asarray, nv), x, train=False)
    o = o[0] if isinstance(o, tuple) else o
    pred = np.asarray(o["pred"])
    ref = z["__pred__"].transpose(0, 2, 1)
    assert pred.shape == ref.shape
    assert float(np.abs(pred - ref).max()) < 1e-3
    if name == "seg":  # Proto path: transpose-conv orientation must match
        for k in ("__aux0__", "__aux1__", "__aux2__"):
            if k in z.files and z[k].ndim == 4 and z[k].shape[1] == 32:
                d = np.abs(np.asarray(o["proto"]) - z[k].transpose(0, 2, 3, 1)).max()
                assert float(d) < 1e-4


def test_classify_forward_parity():
    """yolov8n-cls vs torch reference: our logits softmax to the reference's
    eval probabilities exactly (reference Classify returns softmax in eval)."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import ClassificationModel
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    out = CACHE / "ref_cls.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.tasks import ClassificationModel\n"
            "m = ClassificationModel('yolov8n-cls.yaml', ch=3, verbose=False).eval().float()\n"
            "x = torch.from_numpy(np.random.RandomState(42).rand(1,3,64,64).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "p = y[0] if isinstance(y, (list, tuple)) else y\n"
            f"np.savez(r'{out}', __pred__=p.numpy(), __input__=x.numpy(),"
            " **{k: v.detach().numpy() for k, v in m.state_dict().items()})\n")
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    m = ClassificationModel("yolov8n-cls", verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    nv, rep = convert_state_dict(sd, v, strict=True)
    assert rep["unused"] == []
    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    o = m.apply(jax.tree.map(jnp.asarray, nv), x, train=False)
    o = o[0] if isinstance(o, tuple) else o
    pred = o["pred"] if isinstance(o, dict) else o
    probs = np.asarray(jax.nn.softmax(pred, -1))
    assert float(np.abs(probs - z["__pred__"]).max()) < 1e-6


def test_c3k2_module_parity_and_shortcut_semantics():
    """Module-level C3k2 vs torch: the full-model random-init parity is
    numerically insensitive to the Bottleneck residual adds (their
    contribution attenuates through downstream BN at init), so this pins the
    semantics where they are visible. Guards the round-2 fix: reference C3k2
    defaults shortcut=True (block.py:860) while C2f defaults False."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.block import C3k2
    from edgeyolo_tpu.nn.tasks import LayerSpec, build_module
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict, flax_path_to_torch_key

    out = CACHE / "ref_c3k2_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.block import C3k2\n"
            "m = C3k2(32, 64, 1, False, 0.25).eval().float()\n"
            "assert m.m[0].add, 'reference default must carry the residual'\n"
            "x = torch.from_numpy(np.random.RandomState(1).rand(1,32,8,8).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))

    # the registry-built module (what GraphNet uses) must default shortcut=True
    spec = LayerSpec(i=0, f=(-1,), n=1, name="C3k2", args=(64, 1, False, 0.25),
                     kwargs=(), c2=64)
    built = build_module(spec)
    assert built.shortcut is True

    m = C3k2(c2=64, n=1, c3k=False, e=0.25)
    v = m.init(jax.random.PRNGKey(0), x)
    nv, rep = convert_state_dict(sd, v, strict=True, key_fn=flax_path_to_torch_key)
    y = m.apply(jax.tree.map(jnp.asarray, nv), x)
    d = float(np.abs(z["__y__"].transpose(0, 2, 3, 1) - np.asarray(y)).max())
    assert d < 1e-3, f"C3k2 diverged from torch: {d}"


def test_rhjm_module_parity():
    """Module-level RHJM vs torch (registry-only module — no stock config uses
    it, so the whole-model parity runs never touch it): ECA-adaptive kernel
    size, adaptive-avg-pool in BOTH directions (down to SxS and back up to
    HxW), and the position-major/channel-fastest local-conv serialization
    (reference block.py:2011-2056)."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.edgeline import RHJM

    out = CACHE / "ref_rhjm_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.block import RHJM\n"
            "m = RHJM(128).eval().float()\n"  # C=128 -> ECA k=5 (k=3 would mask a fixed-k bug)
            "x = torch.from_numpy(np.random.RandomState(1).rand(2,128,14,10).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))
    m = RHJM(c2=128)
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["conv_local"]["kernel"].shape[0] == z["conv_local.weight"].shape[-1], \
        "ECA kernel-size rule diverged from the reference"
    v = jax.tree.map(jnp.asarray, {
        "params": {
            "conv_local": {"kernel": z["conv_local.weight"].transpose(2, 1, 0)},
            "conv_global": {"kernel": z["conv_global.weight"].transpose(2, 1, 0)},
        }
    })
    y = m.apply(v, x)
    d = float(np.abs(z["__y__"].transpose(0, 2, 3, 1) - np.asarray(y)).max())
    assert d < 1e-5, f"RHJM diverged from torch: {d}"


WORLD_CASES = [
    # v1 carries ImagePoolingAttn (refreshes the TEXT stream mid-graph while
    # WorldDetect keeps the original features — reference WorldModel.predict
    # ori_txt_feats, nn/tasks.py:672-686); v2 is the plain C2fAttn variant.
    ("worldv1", "yolov8s-world.yaml", "yolov8s-world"),
    ("worldv2", "yolov8s-worldv2.yaml", "yolov8s-worldv2"),
]


@pytest.mark.parametrize("name,ref_cfg,our_cfg", WORLD_CASES, ids=[c[0] for c in WORLD_CASES])
def test_world_forward_parity(name, ref_cfg, our_cfg):
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.tasks import WorldModel
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    out = CACHE / f"ref_{name}.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.tasks import WorldModel\n"
            f"m = WorldModel('{ref_cfg}', ch=3, verbose=False).eval().float()\n"
            "x = torch.from_numpy(np.random.RandomState(42).rand(1,3,64,64).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "pred = y[0] if isinstance(y, (list, tuple)) else y\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __pred__=pred.numpy(), __input__=x.numpy(),\n"
            "         __txt__=m.txt_feats.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    m = WorldModel(our_cfg, verbose=False)
    m.text = np.asarray(z["__txt__"])  # same placeholder bank the torch side used
    m.nc = m.text.shape[1]
    v = m.init(0, imgsz=64)
    nv, rep = convert_state_dict(sd, v, strict=True)
    assert [u for u in rep["unused"] if "dfl" not in u] == []

    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    m.variables = jax.tree.map(jnp.asarray, nv)
    m.text = jnp.asarray(np.asarray(z["__txt__"]), jnp.float32)
    pred = np.asarray(m.apply(m.variables, x, train=False)["pred"])
    ref = z["__pred__"].transpose(0, 2, 1)
    assert pred.shape == ref.shape
    d = np.abs(pred - ref)
    assert float(d[..., :4].max()) < 5e-3, f"box decode diverged: {d[..., :4].max()}"
    assert float(d[..., 4:].max()) < 1e-3, f"cls scores diverged: {d[..., 4:].max()}"


def test_dysample_module_parity():
    """Module-level DySample vs torch ('lp' style): offset-conv channel
    layout [xy][g][s^2], pixel_shuffle subpixel distribution, init_pos grid
    bias, and grid_sample(align_corners=False, padding_mode=border)
    bilinear semantics — no stock config exercises it, so whole-model parity
    never touches it (reference nn/modules/dysample.py:20-93)."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.extra import DySample

    out = CACHE / "ref_dysample_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.dysample import DySample\n"
            "m = DySample(32, 2, 'lp', 4).eval().float()\n"
            "with torch.no_grad():\n"
            "    m.offset.weight += torch.randn_like(m.offset.weight) * 0.2\n"
            "    m.offset.bias += torch.randn_like(m.offset.bias) * 0.5\n"  # exercise real offsets
            "x = torch.from_numpy(np.random.RandomState(1).rand(2,32,6,9).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))
    m = DySample(c1=32, scale=2, style="lp", groups=4)
    v = {"params": {"offset": {
        "kernel": jnp.asarray(z["offset.weight"].transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(z["offset.bias"]),
    }}}
    y = m.apply(v, x)
    d = float(np.abs(z["__y__"].transpose(0, 2, 3, 1) - np.asarray(y)).max())
    assert d < 1e-5, f"DySample diverged from torch: {d}"


def test_wtconv2d_module_parity():
    """Module-level WTConv2d vs torch at 2 wavelet levels on odd spatial dims
    (exercises the odd-dim zero-pad + post-IWT crop): DWT/IWT filter banks,
    [C][4] sub-band channel order, 0.1-init scales, stride subsampling
    (reference conv.py:408-600). No stock config uses WTConv2d."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.extra import WTConv2d

    out = CACHE / "ref_wtconv_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.conv import WTConv2d\n"
            "m = WTConv2d(8, 8, kernel_size=5, stride=2, wt_levels=2).eval().float()\n"
            "with torch.no_grad():\n"
            "    for p in m.parameters():\n"
            "        if p.requires_grad: p += torch.randn_like(p) * 0.05\n"
            "x = torch.from_numpy(np.random.RandomState(1).rand(2,8,13,11).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))
    m = WTConv2d(c2=8, k=5, s=2, levels=2, wave="db1")
    v = m.init(jax.random.PRNGKey(0), x)
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    sd = {k: z[k] for k in z.files
          if not k.startswith("__") and "wt_filter" not in k and "iwt_filter" not in k}
    key_fn = lambda path: ".".join(  # module-level: no l{i}_ root to strip
        __import__("re").sub(r"_(?=\d+$)", ".", p) for p in path[:-1]
    ) + "." + {"kernel": "weight", "bias": "bias", "weight": "weight"}[path[-1]]
    nv, rep = convert_state_dict(sd, v, strict=True, key_fn=key_fn)
    assert rep["unused"] == []
    y = m.apply(jax.tree.map(jnp.asarray, nv), x)
    d = float(np.abs(z["__y__"].transpose(0, 2, 3, 1) - np.asarray(y)).max())
    assert d < 1e-5, f"WTConv2d diverged from torch: {d}"


def test_sppf_wavelet_module_parity():
    """Module-level SPPF_Wavelet vs torch (no stock config uses it): cv1 ->
    Haar DWT -> f_ll 1x1 / SHARED f_h 3x3 -> bilinear upsample -> concat ->
    cv2 (reference block.py:261-322). Interior is tight; the documented 2x-
    bilinear fast path differs from edge-clamped F.interpolate only on the
    1px border (edgeline.py _bilinear_resize), which the 1x1 cv2 keeps local
    — so border columns get a loose band."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.edgeline import SPPF_Wavelet
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict, flax_path_to_torch_key

    out = CACHE / "ref_sppfwav_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.block import SPPF_Wavelet\n"
            "m = SPPF_Wavelet(32, 48).eval().float()\n"
            "x = torch.from_numpy(np.random.RandomState(1).rand(2,32,12,10).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))
    m = SPPF_Wavelet(c2=48)
    v = m.init(jax.random.PRNGKey(0), x)
    sd = {k: z[k] for k in z.files if not k.startswith("__") and "dwt" not in k}
    key_fn = lambda path: flax_path_to_torch_key(("l0_X", *path)).removeprefix("model.0.")
    nv, rep = convert_state_dict(sd, v, strict=True, key_fn=key_fn)
    assert rep["unused"] == []
    y = np.asarray(m.apply(jax.tree.map(jnp.asarray, nv), x))
    ref = z["__y__"].transpose(0, 2, 3, 1)
    d_int = float(np.abs(ref[:, 1:-1, 1:-1] - y[:, 1:-1, 1:-1]).max())
    assert d_int < 1e-5, f"SPPF_Wavelet interior diverged: {d_int}"
    assert float(np.abs(ref - y).max()) < 0.5  # border fast-path band


def test_mulgate_module_parity():
    """Module-level MulGate vs torch (registry-only; rebuilt this round to the
    reference's exact structure — DSConv k=7 pre, biased plain-conv gates,
    zero-init mix + zero-init BN, per-channel gamma 1e-2, unconditional
    residual; block.py:93-109). Weights are randomized so the zero-inits
    don't mask layout errors."""
    import jax
    import jax.numpy as jnp

    from edgeyolo_tpu.nn.modules.edgeline import MulGate
    from edgeyolo_tpu.utils.torch_convert import convert_state_dict

    out = CACHE / "ref_mulgate_micro.npz"
    if not out.exists():
        CACHE.mkdir(exist_ok=True)
        env = dict(os.environ, PYTHONPATH=f"{REPO}/tools/ref_shim:.")
        code = (
            "import numpy as np, torch\n"
            "torch.manual_seed(0)\n"
            "from ultralytics.nn.modules.block import MulGate\n"
            "m = MulGate(16).eval().float()\n"
            "with torch.no_grad():\n"
            "    for p in m.parameters(): p += torch.randn_like(p) * 0.1\n"
            "x = torch.from_numpy(np.random.RandomState(1).rand(2,16,10,12).astype(np.float32))\n"
            "with torch.no_grad(): y = m(x)\n"
            "sd = {k: v.numpy() for k, v in m.state_dict().items()}\n"
            f"np.savez(r'{out}', __x__=x.numpy(), __y__=y.numpy(), **sd)\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REF, env=env, check=True,
                       capture_output=True, text=True)
    z = np.load(out)
    x = jnp.asarray(z["__x__"].transpose(0, 2, 3, 1))
    m = MulGate(c2=16)
    v = m.init(jax.random.PRNGKey(0), x)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}
    import re as _re

    key_fn = lambda path: ".".join(
        _re.sub(r"_(?=\d+$)", ".", p) for p in path[:-1]
    ) + ("." + {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}.get(path[-1], path[-1])
         if path[:-1] else path[-1])
    nv, rep = convert_state_dict(sd, v, strict=True, key_fn=key_fn)
    assert [u for u in rep["unused"] if "num_batches" not in u] == []
    y = m.apply(jax.tree.map(jnp.asarray, nv), x)
    d = float(np.abs(z["__y__"].transpose(0, 2, 3, 1) - np.asarray(y)).max())
    assert d < 1e-5, f"MulGate diverged from torch: {d}"


def test_square_convtranspose_export_convention():
    """Square (in==out) ConvTranspose kernels cannot be disambiguated from
    regular conv kernels by shape: torch's deconv weight is (in,out,kh,kw)
    applied spatially flipped vs flax. Until round 5 both converter directions
    silently took the regular-conv branch for Proto's 256->256 upsample —
    bit-exact round-trips (the mistakes were symmetric), scrambled torch
    forwards. Pins torch-forward equality in both directions for a square
    deconv (reference block.py:123 Proto.upsample)."""
    import torch

    import flax.linen as nn
    import jax.numpy as jnp

    from edgeyolo_tpu.utils.torch_convert import _to_flax

    rng = np.random.RandomState(0)
    cin = cout = 4
    w_t = rng.randn(cin, cout, 2, 2).astype(np.float32)
    x = rng.rand(1, cin, 6, 6).astype(np.float32)
    tm = torch.nn.ConvTranspose2d(cin, cout, 2, 2, 0, bias=False)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(w_t))
        y_t = tm(torch.from_numpy(x)).numpy()

    # import direction: is_convt hint must produce torch-equal forwards
    k = _to_flax(w_t, (2, 2, cin, cout), "kernel", is_convt=True)
    m = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), padding="SAME", use_bias=False)
    y_f = m.apply({"params": {"kernel": jnp.asarray(k)}},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t, atol=1e-5)

    # export direction: the exact inverse (round-trip identity through the
    # convT-specific transform, NOT the regular-conv one)
    w_back = np.ascontiguousarray(k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
    np.testing.assert_array_equal(w_back, w_t)
