"""Model DSL parsing + parameter-count parity with the reference as-built.

Reference counts were measured by running the reference's own parse_model
(ultralytics/nn/tasks.py:958) on its YAMLs; our counts exclude the 16 frozen
DFL arange weights the reference counts as parameters (nn/modules/block.py:72,
'2624080 parameters, 2624064 gradients'). Note the fork forces c3k=True only
for scales l/x (tasks.py:1064-1066), so its yolo11m is 19,774,656 — the 20.1M
in the YAML comment is stale upstream data.
"""

import pytest

from edgeyolo_tpu.nn.tasks import DetectionModel, derive_strides, parse_spec, yaml_model_load

DFL = 16  # frozen DFL weights counted by torch but not owned as params here

PARITY = {
    ("yolo11", "n"): 2624080,
    ("yolo11", "s"): 9458752,
    ("yolo11", "m"): 19774656,  # fork as-built (see module docstring)
    ("yolo11", "l"): 25372160,
    ("yolo11", "x"): 56966176,
    ("yolo11-lineattention", "n"): 2638672,
    ("yolo11-dsc3k2-wavelet", "n"): 2659880,
    ("yolo11-gf2detect", "n"): 2628307,
    ("yolo11-t", "n"): 2664107,
    ("edgeline-yolo", "n"): 2678699,
    ("edgeline-yolo", "s"): 9617483,
    # other model families (reference-as-built counts)
    ("yolov8", "n"): 3157200,
    ("yolov8", "s"): 11166560,
    ("yolov8-seg", "n"): 3409968,
    ("yolov8-pose", "n"): 3295470,
    ("yolov8-obb", "n"): 3228867,
    ("yolov10", "n"): 2775520,
    ("yolov12", "n"): 2553904,
    ("yolov13", "n"): 2494151,
    ("yolov9t", ""): 2128720,
    ("yolov9s", ""): 7318368,
    ("yolov9e", ""): 58206592,
    ("yolov5", "n"): 2654816,
    ("yolov3", ""): 103754144,
    ("yolov6", "n"): 4500080,
    ("yolo11-seg", "n"): 2876848,
    ("yolo11-pose", "n"): 2908507,
    ("yolo11-obb", "n"): 2695747,
    ("rtdetr-l", ""): 32970476 + 16,  # no DFL in RT-DETR; +16 cancels the shared DFL adjust
    # round-2 additions (reference as-built counts via its own parse_model)
    ("yolov8-p2", "n"): 3354144,
    ("yolov8-p6", "n"): 4984352,
    ("yolov8-ghost", "n"): 1865316,
    ("yolov8-ghost-p2", "n"): 2033944,
    ("yolov8-ghost-p6", "n"): 2901100,
    ("yolov10n", ""): 2775520,
    ("yolov10s", ""): 8128272,
    ("yolov10m", ""): 16576768,
    ("yolov10b", ""): 20574384,
    ("yolov10l", ""): 25888688,
    ("yolov10x", ""): 31808960,
    ("yolov9c", ""): 25590912,
    ("yolov9m", ""): 20216160,
    ("yolov3-spp", ""): 104803744,
    ("yolov3-tiny", ""): 12173248,
    ("yolov5-p6", "n"): 4334896,
    ("yolo11-test", "n"): 2678699,   # == edgeline-yolo (the full EdgeLine config)
    ("yolo11-tune", "n"): 2740939,
    ("yolov8-test", "n"): 3197798,
}


@pytest.mark.parametrize("cfg,scale", list(PARITY))
def test_param_parity(cfg, scale):
    d = yaml_model_load(f"{cfg}.yaml")
    if scale:
        d["scale"] = scale
    m = DetectionModel(d)
    # abstract count: no device compute, fast enough for the full table
    assert m.count_params() == PARITY[(cfg, scale)] - DFL


def test_strides_static():
    m = DetectionModel("yolo11n.yaml")
    assert m.stride == (8, 16, 32)


def test_save_list():
    d = yaml_model_load("yolo11n.yaml")
    _, save, _ = parse_spec(d)
    assert save == (4, 6, 10, 13, 16, 19, 22)


def test_scale_inference_from_name():
    d = yaml_model_load("yolo11s.yaml")
    assert d["scale"] == "s"


def test_parse_all_bundled_yamls():
    """Every bundled model YAML compiles through the DSL (parse + strides).

    Reference configs whose modules do not exist anywhere in the reference
    source are not shipped — SURVEY 'verified defects' policy: never
    replicate dead configs. Verified dead in the reference as-built:
    yolov13-lsnet.yaml / yolov13-lsnet-test.yaml reference `LSBlock`, which
    is defined NOWHERE in the reference source tree (grep confirms), so
    those configs cannot instantiate there either; yolov13-X references the
    equally-undefined HyperACEPlus. yolo11-cls-resnet18 (a TorchVision
    wrapper in the reference) ships as a native ResNetLayer rebuild with the
    same topology (e=1 BasicBlock expansion, [2,2,2,2] depths).
    """
    from pathlib import Path

    import edgeyolo_tpu

    models_dir = Path(edgeyolo_tpu.__file__).parent / "cfg" / "models"
    yamls = sorted(models_dir.glob("*.yaml"))
    assert len(yamls) >= 55
    for y in yamls:
        d = yaml_model_load(y)
        spec, save, info = parse_spec(d)
        assert len(spec) > 3, y.name
        strides = derive_strides(spec)
        assert max(strides) >= 8, y.name


def test_world_param_parity():
    """World models count against the reference WorldModel as-built."""
    from edgeyolo_tpu.nn.tasks import WorldModel

    m = WorldModel("yolov8-worldv2.yaml")
    assert m.count_params() == 3695183 - DFL
    m1 = WorldModel("yolov8-world.yaml")
    assert m1.count_params() == 4204111 - DFL


def test_activation_override_reaches_nested_convs():
    """yaml `activation:` must switch act=True convs INSIDE composite blocks
    (SPPF internals etc.), mirroring the reference's Conv.default_act global —
    not just the top-level Conv layers."""
    import jax
    import numpy as np

    cfg = {"nc": 2, "scale": "",
           "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "SPPF", [16, 5]]],
           "head": [[-1, 1, "Classify", [2]]]}
    relu = DetectionModel(dict(cfg, activation="nn.ReLU()"))
    silu = DetectionModel(dict(cfg))
    assert relu.net.default_act == "relu" and silu.net.default_act == "silu"
    v = relu.init(0, imgsz=32)
    x = jax.numpy.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jax.numpy.float32)
    out_r = relu.net.apply(v, x, train=False)
    out_s = silu.net.apply(v, x, train=False)  # same weights, different act
    r = np.asarray(out_r if not isinstance(out_r, dict) else out_r["pred"])
    s = np.asarray(out_s if not isinstance(out_s, dict) else out_s["pred"])
    assert np.abs(r - s).max() > 1e-6, "activation override had no effect"


def test_rtdetr_resnet_backbone_parses_reference_layout():
    """rtdetr-resnet yamls keep the reference [c1, c2, s, is_first, n] arg
    layout; the parser must strip c1 and derive sane channels/strides."""
    spec, save, info = parse_spec(yaml_model_load("rtdetr-resnet50.yaml"))
    res = [sp for sp in spec if sp.name == "ResNetLayer"]
    assert len(res) == 5
    assert res[0].args[0] == 64 and res[0].args[2] is True  # stem: c2=64, is_first
    strides = derive_strides(spec)
    rs = [int(strides[sp.i]) for sp in res]
    assert rs == [4, 4, 8, 16, 32], rs
    assert [sp.c2 for sp in res] == [64, 256, 512, 1024, 2048]
