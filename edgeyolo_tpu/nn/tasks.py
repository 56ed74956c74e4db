"""YAML model DSL -> flax graph compiler + task models.

Behavioral spec: ultralytics/nn/tasks.py:958-1147 (parse_model: depth/width/
max-channel compound scaling, channel inference, save-list for skips,
per-family arg rules) and :113-460 (BaseModel/DetectionModel graph walk).

TPU-first re-design: the layer graph is parsed once on host into a static
`LayerSpec` tuple; `GraphNet` (flax) executes it as a straight-line program —
no dynamic module dispatch inside jit, everything traced and fused by XLA.
Strides are derived statically from the graph (no dummy forward needed).
"""

from __future__ import annotations

import ast
import contextlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edgeyolo_tpu.cfg import find_model_yaml, guess_model_scale
from edgeyolo_tpu.utils import LOGGER, colorstr, make_divisible, yaml_load
from edgeyolo_tpu.nn import modules as M

# ----------------------------------------------------------------------------
# Module registry: name -> (flax class, positional field names AFTER c1/c2
# transformation, i.e. args as they appear post-parse: [c2?, ...]).
# ----------------------------------------------------------------------------
_REG: dict[str, tuple[type, list[str]]] = {
    "Conv": (M.Conv, ["c2", "k", "s", "p", "g", "d", "act"]),
    "ConvBN": (M.ConvBN, ["c2", "k", "s", "p", "g", "d", "act"]),
    "DWConv": (M.DWConv, ["c2", "k", "s", "d", "act"]),
    "DSConv": (M.DSConv, ["c2", "k", "s", "p", "d"]),
    "LightConv": (M.LightConv, ["c2", "k"]),
    "GhostConv": (M.GhostConv, ["c2", "k", "s", "g", "act"]),
    "Focus": (M.Focus, ["c2", "k", "s", "p", "g", "act"]),
    "ConvTranspose": (M.ConvTranspose, ["c2", "k", "s", "p", "bn", "act"]),
    "nn.ConvTranspose2d": (M.ConvTranspose, ["c2", "k", "s", "p"]),
    "Index": (M.Index, ["c2", "index"]),
    "Bottleneck": (M.Bottleneck, ["c2", "shortcut", "g", "k", "e"]),
    "C1": (M.C1, ["c2", "n"]),
    "C2": (M.C2, ["c2", "n", "shortcut", "g", "e"]),
    "C2f": (M.C2f, ["c2", "n", "shortcut", "g", "e"]),
    "C3": (M.C3, ["c2", "n", "shortcut", "g", "e"]),
    "C3x": (M.C3x, ["c2", "n", "shortcut", "g", "e"]),
    "C3k": (M.C3k, ["c2", "n", "shortcut", "g", "e", "k"]),
    "C3k2": (M.C3k2, ["c2", "n", "c3k", "e", "g", "shortcut"]),
    "SPP": (M.SPP, ["c2", "k"]),
    "SPPF": (M.SPPF, ["c2", "k"]),
    "C2PSA": (M.C2PSA, ["c2", "n", "e"]),
    "C2fPSA": (M.C2fPSA, ["c2", "n", "e"]),
    "PSA": (M.PSA, ["c2", "e"]),
    "SCDown": (M.SCDown, ["c2", "k", "s"]),
    "CBAM": (M.CBAM, ["c1", "k"]),
    # EdgeLine family
    "C2PSA_LinearAttention": (M.C2PSA_LinearAttention, ["c2", "n", "e", "attn_ratio", "num_heads", "mlp_ratio"]),
    "C3k2_Wavelet": (M.C3k2_Wavelet, ["c2", "n", "c3k", "e", "g", "shortcut"]),
    "C3k2_TWavelet": (M.C3k2_Wavelet, ["c2", "n", "c3k", "e", "g", "shortcut"]),
    "DSC3K2": (M.DSC3K2, ["c2", "n", "dsc3k", "e", "g", "shortcut", "k1", "k2", "d2"]),
    "DSC3K2_Wavelet": (M.DSC3K2_Wavelet, ["c2", "n", "dsc3k", "e", "g", "shortcut", "k1", "k2", "d2"]),
    "SPPF_Wavelet": (M.SPPF_Wavelet, ["c2", "k"]),
    "MulGate": (M.MulGate, ["c2", "e", "k", "d", "gamma0"]),
    "RHJM": (M.RHJM, ["c2", "local_size", "gamma", "b", "local_weight"]),
    # v12/v13/v10/v9 families
    "A2C2f": (M.A2C2f, ["c2", "n", "a2", "area", "residual", "mlp_ratio", "e", "g", "shortcut"]),
    "HyperACE": (M.HyperACE, ["c2", "n", "num_hyperedges", "dsc3k", "shortcut", "e1", "e2", "context", "channel_adjust"]),
    "DownsampleConv": (M.DownsampleConv, ["c1", "channel_adjust"]),
    "FullPAD_Tunnel": (M.FullPAD_Tunnel, []),
    "CIB": (M.CIB, ["c2", "shortcut", "e", "lk"]),
    "C2fCIB": (M.C2fCIB, ["c2", "n", "shortcut", "lk", "g", "e"]),
    "RepVGGDW": (M.RepVGGDW, ["ed"]),
    "RepConv": (M.RepConv, ["c2", "k", "s"]),
    "RepNCSPELAN4": (M.RepNCSPELAN4, ["c2", "c3", "c4", "n"]),
    "ELAN1": (M.ELAN1, ["c2", "c3", "c4"]),
    "AConv": (M.AConv, ["c2"]),
    "ADown": (M.ADown, ["c2"]),
    "SPPELAN": (M.SPPELAN, ["c2", "c3", "k"]),
    "CBLinear": (M.CBLinear, ["c2s", "k", "s"]),
    "CBFuse": (M.CBFuse, ["idx"]),
    "GhostBottleneck": (M.GhostBottleneck, ["c2", "k", "s"]),
    "C3Ghost": (M.C3Ghost, ["c2", "n", "shortcut", "g", "e"]),
    "BottleneckCSP": (M.BottleneckCSP, ["c2", "n", "shortcut", "g", "e"]),
    "HGStem": (M.HGStem, ["cm", "c2"]),
    "HGBlock": (M.HGBlock, ["cm", "c2", "k", "n", "lightconv", "shortcut", "act"]),
    "ResNetLayer": (M.ResNetLayer, ["c2", "s", "is_first", "n", "e"]),
    "DySample": (M.DySample, ["c1", "scale", "style", "groups"]),
    "WTConv2d": (M.WTConv2d, ["c2", "k", "s", "bias", "levels", "wave"]),
    # glue
    "Concat": (M.Concat, ["dim"]),
    "nn.Upsample": (M.Upsample, ["size", "scale_factor", "mode"]),
    "nn.MaxPool2d": (M.MaxPool2d, ["k", "s", "p"]),
    "nn.ZeroPad2d": (M.ZeroPad2d, ["pad"]),
    "nn.Identity": (M.Identity, []),
    "Upsample": (M.Upsample, ["size", "scale_factor", "mode"]),
    # heads
    "Detect": (M.Detect, ["nc"]),
    "GF2Detect": (M.GF2Detect, ["nc"]),
    "E2EDetect": (M.E2EDetect, ["nc"]),
    "GFLHeadv2_uniH": (M.GFLHeadv2_uniH, ["nc"]),
    "GFLHeadv2_E2E": (M.GFLHeadv2_E2E, ["nc"]),
    "Segment": (M.Segment, ["nc", "nm", "npr"]),
    "v10Detect": (M.v10Detect, ["nc"]),
    "OBB": (M.OBB, ["nc", "ne"]),
    "Pose": (M.Pose, ["nc", "kpt_shape"]),
    "Classify": (M.Classify, ["c2", "k", "s", "p", "g"]),
    "AIFI": (M.AIFI, ["c1", "cm", "num_heads"]),
    "RepC3": (M.RepC3, ["c2", "n", "e"]),
    "RTDETRDecoder": (M.RTDETRDecoder, ["nc"]),
    "C2fAttn": (M.C2fAttn, ["c2", "n", "ec", "nh", "gc", "shortcut", "g", "e"]),
    "ImagePoolingAttn": (M.ImagePoolingAttn, ["ec"]),
    "WorldDetect": (M.WorldDetect, ["nc", "embed", "with_bn"]),
    # intended-behavior rebuilds of families broken in the reference snapshot
    "DSC3K2_MSLA": (M.DSC3K2_MSLA, ["c2", "n", "dsc3k", "e", "g", "shortcut", "k1", "k2", "d2"]),
    "DSC3K2_LGL": (M.DSC3K2_LGL, ["c2", "n", "dsc3k", "e", "g", "shortcut", "k1", "k2", "d2"]),
    "C3AW_MLM": (M.C3AW_MLM, ["c2", "e", "levels"]),
    "MSLA": (M.MSLA, ["dim", "num_heads"]),
    "HyperACE_Wavelet": (M.HyperACE_Wavelet, ["c2", "n", "num_hyperedges", "dsc3k", "shortcut", "e1", "e2", "context", "channel_adjust"]),
    "Wavelet_SS2D": (M.Wavelet_SS2D, ["c2", "n", "num_hyperedges", "dsc3k", "shortcut", "e1", "e2", "context", "channel_adjust"]),
}

# parse-time sets (membership by *name*, keeping the parser table-driven)
_CONV_LIKE = {
    "Conv", "ConvBN", "ConvTranspose", "GhostConv", "Bottleneck", "SPP", "SPPF", "SPPF_Wavelet",
    "C2fPSA", "C2PSA", "C2PSA_LinearAttention", "DWConv", "Focus", "C1", "C2", "C2f",
    "C3", "C3x", "C3k", "C3k2", "C3k2_Wavelet", "C3k2_TWavelet", "DSC3K2", "DSC3K2_Wavelet",
    "PSA", "SCDown", "DSConv", "LightConv", "Classify", "MulGate", "RHJM",
    "A2C2f", "C2fCIB", "CIB", "RepConv", "RepNCSPELAN4", "ELAN1", "AConv", "ADown",
    "SPPELAN", "GhostBottleneck", "C3Ghost", "BottleneckCSP", "nn.ConvTranspose2d", "RepC3", "C2fAttn",
    "DSC3K2_MSLA", "DSC3K2_LGL", "C3AW_MLM",
}
_REPEAT_INSERT = {
    # NOTE: bare "C3k" deliberately absent — the reference's repeat-insert set
    # (tasks.py:1044-1066) has C3/C3k2 but not C3k, so n>1 C3k lines build n
    # sequential blocks, not one block with n inner bottlenecks
    "C1", "C2", "C2f", "C3", "C3x", "C3k2", "C3k2_Wavelet", "C3k2_TWavelet",
    "C2fPSA", "C2PSA", "C2PSA_LinearAttention", "DSC3K2", "DSC3K2_Wavelet",
    "A2C2f", "C2fCIB", "BottleneckCSP", "C3Ghost", "RepC3", "C2fAttn", "DSC3K2_MSLA", "DSC3K2_LGL",
}
_C3K2_FAMILY = {"C3k2", "DSC3K2", "C3k2_Wavelet", "C3k2_TWavelet", "DSC3K2_Wavelet",
                "DSC3K2_MSLA", "DSC3K2_LGL"}
_HEADS = {"Detect", "GF2Detect", "E2EDetect", "GFLHeadv2_uniH", "GFLHeadv2_E2E",
          "Segment", "OBB", "Pose", "v10Detect", "RTDETRDecoder", "WorldDetect"}
# spatial stride factor per module (for static stride derivation)
_STRIDE_ARG = {"Conv", "ConvBN", "DWConv", "DSConv", "GhostConv", "Focus", "SCDown", "RepConv",
               "nn.MaxPool2d"}
_STRIDE_FIXED = {"AConv": 2.0, "ADown": 2.0, "DownsampleConv": 2.0, "HGStem": 4.0}


@dataclass(frozen=True)
class LayerSpec:
    """One compiled graph node (hashable: safe as a flax module field)."""

    i: int
    f: tuple[int, ...]  # input layer indices (-1 = previous)
    n: int
    name: str
    args: tuple
    kwargs: tuple[tuple[str, Any], ...]
    c2: int


def _literal(v):
    if isinstance(v, str):
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v
    return v


def yaml_model_load(path: str | Path) -> dict:
    """Load a model YAML, inferring scale from the *requested* name (yolo11s -> s),
    which may differ from the resolved unified file (yolo11.yaml)."""
    requested = Path(path)
    resolved = find_model_yaml(path)
    d = yaml_load(resolved, append_filename=True)
    d["scale"] = d.get("scale") or guess_model_scale(requested) or guess_model_scale(resolved)
    return d


def parse_spec(d: dict, ch: int = 3, verbose: bool = False):
    """Compile a model dict into (layers, save, info).

    Mirrors reference parse_model scaling semantics exactly (tasks.py:958-1147):
      n' = max(round(n*depth), 1) for n>1;
      c2' = make_divisible(min(c2, max_channels)*width, 8) unless c2 == nc;
      CSP family gets repeats inserted at arg index 2;
      C3k2 family forces c3k=True at scales l/x;
      heads receive the per-level input channel list.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    scale = d.get("scale") or (tuple(scales.keys())[0] if scales else "")
    act_override = None
    if d.get("activation"):  # e.g. "nn.ReLU()" in yolov6
        a = str(d["activation"]).lower()
        for cand in ("relu6", "relu", "silu", "sigmoid", "tanh"):
            if cand in a:
                act_override = cand
                break
    depth, width, max_channels = (scales[scale] if scales and scale in scales else (
        d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")))
    legacy = True

    ch_list = [ch]
    layers: list[LayerSpec] = []
    save: set[int] = set()
    if verbose:
        LOGGER.info(f"{'':>3}{'from':>20}{'n':>3}  {'module':<30}{'arguments':<30}")
    for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
        # yaml-level variables resolve like the reference parse_model
        # (tasks.py:986): "nc" and "kpt_shape" by name
        args = [nc if a == "nc"
                else d.get("kpt_shape", [17, 3]) if a == "kpt_shape"
                else _literal(a) for a in args]
        n_scaled = max(round(n * depth), 1) if n > 1 else n
        kwargs: dict[str, Any] = {}
        f_list = [f] if isinstance(f, int) else list(f)

        if name in _CONV_LIKE:
            c1, c2 = ch_list[f_list[0]], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if act_override and name in {"Conv", "ConvBN", "DWConv"} and len(args) < 7:
                kwargs["act"] = act_override
            if name == "C2fAttn":
                args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)  # embed
                args[2] = int(max(round(min(args[2], max_channels // 2 // 32) * width), 1)
                              if args[2] > 1 else args[2])  # heads
            if name in _REPEAT_INSERT:
                args.insert(1, n_scaled)  # post-c1-drop index (=ref index 2)
                n_scaled = 1
            if name in _C3K2_FAMILY:
                legacy = False
                if scale and scale in "lx":
                    # args = [c2, n, c3k, ...]
                    if len(args) > 2:
                        args[2] = True
                    else:
                        args.append(True)
            if name == "A2C2f":
                legacy = False
                if scale and scale in "lx":
                    # append residual=True, mlp_ratio=1.5 (ref tasks.py:1073-1076)
                    while len(args) < 6:
                        args.append({2: True, 3: 1, 4: False, 5: 2.0}.get(len(args)))
                    args[4] = True
                    args[5] = 1.5
        elif name in {"HyperACE", "HyperACE_Wavelet", "Wavelet_SS2D"}:
            # ref tasks.py:1106-1121: c1 from the SECOND input, he scaled by size
            legacy = False
            c1 = ch_list[f_list[1]]
            c2 = make_divisible(min(args[0], max_channels) * width, 8)
            he = args[1]
            if scale == "n":
                he = int(he * 0.5)
            elif scale == "x":
                he = int(he * 1.5)
            args = [c2, n_scaled, he, *args[2:]]
            n_scaled = 1
            if scale and scale in "lx":
                args.append(False)  # channel_adjust
        elif name == "DownsampleConv":
            c1 = ch_list[f_list[0]]
            c2 = c1 * 2
            args = [c1]
            if scale and scale in "lx":
                args.append(False)
                c2 = c1
        elif name == "DySample":
            c1 = ch_list[f_list[0]]
            c2 = c1
            args = [c1, *args]
        elif name == "CBLinear":
            c2 = tuple(args[0])
            args = [tuple(args[0]), *args[1:]]
        elif name == "CBFuse":
            c2 = ch_list[f_list[-1]]
            args = [tuple(args[0])] if args else [()]
        elif name in {"HGStem", "HGBlock"}:
            c2 = args[1]
            if name == "HGBlock":
                args.insert(3, n_scaled)
                n_scaled = 1
        elif name == "ResNetLayer":
            # reference yaml layout is [c1, c2, s, is_first, n, e?]
            # (rt-detr/rtdetr-resnet50.yaml:15); detect it by the bool at
            # index 3 and strip the redundant c1 (the local module derives
            # input channels from the graph)
            if len(args) >= 4 and isinstance(args[3], bool):
                args = list(args[1:])
            e_exp = args[4] if len(args) > 4 else 4
            # c2 = base channels when is_first (stem), else expansion x e
            c2 = args[0] if (len(args) > 2 and args[2]) else args[0] * e_exp
        elif name == "AIFI":
            c1 = ch_list[f_list[0]]
            args = [c1, *args]
            c2 = c1
        elif name == "RTDETRDecoder":
            kwargs["ch"] = tuple(ch_list[x] for x in f_list)
            c2 = sum(kwargs["ch"])
        elif name == "Concat":
            c2 = sum(ch_list[x] for x in f_list)
        elif name in _HEADS:
            kwargs["ch"] = tuple(ch_list[x] for x in f_list)
            # v10Detect and the EdgeLine E2E heads always use the lightweight
            # DW cls tower (reference head.py:764 and :806-824 overwrite cv3
            # after super().__init__)
            kwargs["legacy"] = (False if name in {"v10Detect", "E2EDetect", "GFLHeadv2_E2E"}
                                else legacy)
            if name == "Segment" and len(args) > 2:
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)  # npr
            if name == "Pose" and len(args) > 1 and isinstance(args[1], (list, tuple)):
                # a model/data-level kpt_shape overrides the yaml literal
                # (reference PoseModel.__init__ data_kpt_shape, tasks.py:443-448)
                args[1] = tuple(d.get("kpt_shape", args[1]))
            c2 = sum(kwargs["ch"])
        elif name in {"nn.Upsample", "Upsample"}:
            c2 = ch_list[f_list[0]]
        elif name == "Index":
            c2 = args[0]
        else:
            c2 = ch_list[f_list[0]]

        # normalize negative refs other than -1 (e.g. -2 in yolov3) to absolute
        f_norm = tuple(x if x == -1 else (x % i) for x in f_list)
        layers.append(LayerSpec(i=i, f=f_norm, n=n_scaled, name=name,
                                args=tuple(_freeze(a) for a in args),
                                kwargs=tuple(sorted(kwargs.items())), c2=c2))
        save.update(x % i for x in f_list if x != -1)
        if i == 0:
            ch_list = []
        ch_list.append(c2)
        if verbose:
            LOGGER.info(f"{i:>3}{str(f):>20}{n_scaled:>3}  {name:<30}{str(args):<30}")
    return tuple(layers), tuple(sorted(save)), {"nc": nc, "scale": scale, "ch": tuple(ch_list),
                                                "act": act_override or "silu"}


def _freeze(a):
    return tuple(a) if isinstance(a, list) else a


def derive_strides(layers: Sequence[LayerSpec]) -> list[float]:
    """Static per-layer output stride (input stride 1 at the image)."""
    strides: list[float] = []
    for sp in layers:
        src = sp.f[0]
        s_in = 1.0 if sp.i == 0 else strides[src if src >= 0 else sp.i - 1]
        factor = 1.0
        if sp.name in _STRIDE_ARG:
            fields = _REG[sp.name][1]
            if "s" in fields:
                idx = fields.index("s")
                if idx < len(sp.args):
                    factor = float(sp.args[idx])
            if sp.name == "Focus":
                factor *= 2.0
        elif sp.name in _STRIDE_FIXED:
            factor = _STRIDE_FIXED[sp.name]
        elif sp.name == "DySample":
            sc = sp.args[1] if len(sp.args) > 1 else 2
            factor = 1.0 / float(sc)
        elif sp.name == "ResNetLayer":
            if len(sp.args) > 2 and sp.args[2]:
                factor = 4.0
            elif len(sp.args) > 1:
                factor = float(sp.args[1])
        elif sp.name in {"nn.Upsample", "Upsample"}:
            sf = sp.args[1] if len(sp.args) > 1 else 2
            factor = 1.0 / float(sf or 2)
        elif sp.name in {"ConvTranspose", "nn.ConvTranspose2d"}:
            fields = _REG[sp.name][1]
            idx = fields.index("s")
            sv = float(sp.args[idx]) if idx < len(sp.args) else 2.0
            factor = 1.0 / sv
        strides.append(s_in * factor)
    return strides


def build_module(sp: LayerSpec, extra_kwargs: dict | None = None) -> nn.Module:
    """Instantiate the flax module for one graph node."""
    if sp.name not in _REG:
        raise KeyError(f"unknown module '{sp.name}' in model spec")
    cls, fields = _REG[sp.name]
    kw = {}
    for fname, val in zip(fields, sp.args):
        if val is not None or fname in {"p", "size", "num_heads"}:
            kw[fname] = val
    kw.update(dict(sp.kwargs))
    if sp.name == "nn.ConvTranspose2d":  # raw torch transpose: bias, no BN/act
        kw.setdefault("bn", False)
        kw.setdefault("act", False)
    if extra_kwargs:
        kw.update(extra_kwargs)
    kw["name"] = f"l{sp.i}_{sp.name.replace('.', '_')}"
    # repeats >1 for non-CSP modules: wrap sequentially (rare; mirrors nn.Sequential)
    if sp.n > 1 and sp.name not in _REPEAT_INSERT:
        mods = [cls(**{**kw, "name": f"{kw['name']}_{j}"}) for j in range(sp.n)]
        return _Sequential(mods, name=f"l{sp.i}_seq")
    return cls(**kw)


class _Sequential(nn.Module):
    mods: Sequence[nn.Module]

    def __call__(self, x, train: bool = False):
        for m in self.mods:
            x = m(x, train)
        return x


class GraphNet(nn.Module):
    """Executes a compiled LayerSpec graph (the reference's _predict_once walk,
    reference nn/tasks.py:152-179, as a traced straight-line program)."""

    spec: tuple[LayerSpec, ...]
    save: tuple[int, ...]
    head_stride: tuple[int, ...] = ()
    default_act: str = "silu"  # yaml `activation:` override, applied to every
    # act=True conv in the graph incl. nested ones (reference Conv.default_act)
    bn: tuple[float, float] | None = None  # (eps, flax momentum) convention for
    # every BN in the graph — the detection family passes the reference's
    # initialize_weights override 1e-3/0.03 (torch_utils.py:410-419); classify
    # leaves the torch constructor defaults (None)

    def setup(self):
        mods = []
        for sp in self.spec:
            extra = {"stride": self.head_stride} if sp.name in _HEADS else None
            mods.append(build_module(sp, extra))
        self.blocks = mods

    TEXT_MODULES = frozenset({"C2fAttn", "ImagePoolingAttn", "WorldDetect"})

    def __call__(self, x, train: bool = False, text=None, dn=None, embed=None,
                 capture=None):
        from edgeyolo_tpu.nn.modules.conv import bn_config
        from edgeyolo_tpu.nn.modules.conv import default_act as _act_scope

        bn_scope = bn_config(*self.bn) if self.bn else contextlib.nullcontext()
        with _act_scope(self.default_act), bn_scope:
            return self._walk(x, train=train, text=text, dn=dn, embed=embed,
                              capture=capture)

    def _walk(self, x, train: bool = False, text=None, dn=None, embed=None,
              capture=None):
        # embed: static tuple of layer indices -> return concatenated GAP
        # features instead of the head output (reference _predict_once embed
        # collection, nn/tasks.py:175-178: adaptive_avg_pool2d + cat + unbind)
        embed = tuple(embed) if embed else ()
        stop_at = max(embed) if embed else -1
        feats = []
        # capture: static layer indices whose raw outputs are returned
        # alongside the head output — feature visualization (reference
        # _predict_once visualize hook, nn/tasks.py:173-174)
        capture = tuple(capture) if capture else ()
        captured: dict[int, Any] = {}
        y: dict[int, Any] = {}
        out = x
        ori_text = text  # WorldDetect always sees the un-refreshed features
        for sp, blk in zip(self.spec, self.blocks):
            if len(sp.f) == 1:
                inp = out if sp.f[0] == -1 else y[sp.f[0]]
            else:
                inp = [out if j == -1 else y[j] for j in sp.f]
            if sp.name in self.TEXT_MODULES:
                if sp.name == "WorldDetect":
                    # the head sees the ORIGINAL text features even when an
                    # ImagePoolingAttn refreshed the stream (reference
                    # WorldModel.predict ori_txt_feats, nn/tasks.py:672,684)
                    out = blk(inp, train=train, text=ori_text)
                elif sp.name == "ImagePoolingAttn":
                    # updates the TEXT stream for downstream C2fAttn layers;
                    # the feature stream passes through unchanged (reference
                    # nn/tasks.py:685-686: txt_feats = m(x, txt_feats))
                    text = blk(inp, text, train=train)
                else:  # C2fAttn
                    out = blk(inp, text, train=train)
            elif sp.name == "RTDETRDecoder" and dn is not None:
                out = blk(inp, train=train, dn=dn)
            else:
                out = blk(inp, train=train)
            if sp.i in self.save:
                y[sp.i] = out
            if sp.i in capture:
                captured[sp.i] = out
            if sp.i in embed:
                feats.append(jnp.mean(out, axis=(1, 2)))  # NHWC global avg pool
                if sp.i == stop_at:
                    return jnp.concatenate(feats, axis=-1)
        if capture:
            return out, captured
        return out


def fuse_conv_bn(variables, eps=None):
    """Fold BatchNorm affine+running stats into the preceding conv kernel.

    Matches the two conv->BN scope patterns the module zoo produces —
    ConvBN/DWConv ({'conv': {'kernel'}, 'bn': ...}) and DSConv
    ({'pw': {'kernel'}, 'bn': ...}) — scales the kernel's output-feature axis
    by gamma/sqrt(var+eps) and rewrites the BN to a pure bias so outputs are
    bit-for-bit the same function (reference Conv.forward_fuse semantics,
    nn/tasks.py:214-242 / torch_utils.fuse_conv_and_bn). BNs not directly fed
    by a sibling conv (RepConv identity branch, BottleneckCSP joint BN) are
    left untouched. On XLA the speed effect is ~0 (inference BN already fuses
    into the conv epilogue at compile time) — this exists for API parity and
    for export paths that want literal folded weights.
    """
    from edgeyolo_tpu.nn.modules.conv import MODEL_BN_EPS

    eps = MODEL_BN_EPS if eps is None else eps
    params = jax.tree.map(lambda a: a, variables["params"])
    stats = jax.tree.map(lambda a: a, variables.get("batch_stats", {}))

    def walk(p, s):
        if not isinstance(p, dict):
            return
        for conv_key in ("conv", "pw", "conv_transpose"):
            sub = p.get(conv_key)
            bn_p, bn_s = p.get("bn"), s.get("bn") if isinstance(s, dict) else None
            if (isinstance(sub, dict) and "kernel" in sub and isinstance(bn_p, dict)
                    and isinstance(bn_s, dict) and "mean" in bn_s
                    and sub["kernel"].ndim == 4
                    and sub["kernel"].shape[-1] == bn_s["mean"].shape[0]):
                mean, var = bn_s["mean"], bn_s["var"]
                scale = bn_p.get("scale", jnp.ones_like(mean))
                bias = bn_p.get("bias", jnp.zeros_like(mean))
                g = scale / jnp.sqrt(var + eps)
                sub["kernel"] = sub["kernel"] * g  # broadcasts over out-features
                bn_p["scale"] = jnp.ones_like(scale)
                bn_p["bias"] = bias - mean * g
                bn_s["mean"] = jnp.zeros_like(mean)
                bn_s["var"] = jnp.ones_like(var) - eps  # sqrt(var+eps) == 1
                break
        for key, sub in p.items():
            if isinstance(sub, dict) and key != "bn":
                walk(sub, s.get(key, {}) if isinstance(s, dict) else {})

    walk(params, stats)
    return {**variables, "params": params, "batch_stats": stats}


def amp_cast(tree, dtype=jnp.bfloat16):
    """Cast floating leaves to the AMP compute dtype (master-weight pattern).

    Params stay f32 at rest (optimizer/EMA masters); cast a copy for the
    forward so convs/denses run on the MXU in bf16 end-to-end. BatchNorm
    call sites pin their own math to f32 and cast back (conv.py), the box
    decode pins f32 (head.py decode), so only the traffic-heavy tower
    activations ride bf16. Differentiable: grads of a cast accumulate back
    into the f32 masters. batch_stats must NOT be passed through this (BN
    running stats stay f32).
    """
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, tree
    )


class BaseModel:
    """Host-side handle: spec + flax net + params lifecycle."""

    task = "detect"

    def __init__(self, cfg="yolo11n.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"overriding nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.spec, self.save, info = parse_spec(self.yaml, ch, verbose=verbose)
        self.nc = info["nc"]
        self.scale = info["scale"]
        strides = derive_strides(self.spec)
        head_sp = self.spec[-1]
        self.head_name = head_sp.name
        # head DFL bin count, for criteria that must match the head geometry
        # (reference v8DetectionLoss reads m.reg_max, loss.py:310)
        self.reg_max = int(dict(head_sp.kwargs).get("reg_max", 16))
        # NMS-free heads (v10Detect/E2EDetect/...): criterion must be
        # E2EDetectLoss and val/predict take the (B, max_det, 6) passthrough
        # (reference tasks.py:411-413 keys on getattr(m, 'end2end', False))
        head_cls = _REG.get(head_sp.name, (None, None))[0]
        self.end2end = bool(dict(head_sp.kwargs).get(
            "end2end", getattr(head_cls, "end2end", False)))
        if head_sp.name in _HEADS:
            self.stride = tuple(int(strides[j]) for j in head_sp.f)
        else:
            self.stride = (int(max(strides)),) if strides else (32,)
        # BN convention: the reference's initialize_weights forces every BN to
        # eps=1e-3/momentum=0.03 in DetectionModel.__init__ (nn/tasks.py:367,
        # torch_utils.py:410-419); ClassificationModel never runs it, keeping
        # the torch constructor defaults (nn/tasks.py:457-480).
        from edgeyolo_tpu.nn.modules.conv import (BN_EPS, MODEL_BN_EPS,
                                                  MODEL_BN_MOMENTUM)

        self.bn_override = (None if self.task == "classify"
                            else (MODEL_BN_EPS, MODEL_BN_MOMENTUM))
        self.bn_eps = self.bn_override[0] if self.bn_override else BN_EPS
        self.net = GraphNet(self.spec, self.save, head_stride=self.stride,
                            default_act=info.get("act", "silu"),
                            bn=self.bn_override)
        self.names = {i: f"{i}" for i in range(self.nc)}
        self.variables = None  # {"params": ..., "batch_stats": ...}
        self.quant = None  # QuantState: int8 inference when set (nn/quant.py)

    # -- lifecycle ------------------------------------------------------------
    def init(self, rng: jax.Array | int = 0, imgsz: int = 640, batch: int = 1):
        rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        self.variables = jax.jit(self.net.init, static_argnames=("train",))(rng, x, train=False)
        return self.variables

    def apply(self, variables, x, train: bool = False, mutable=None, **kw):
        """Engine-facing forward. All engines MUST route through this (not
        net.apply) so model families can inject extra inputs — WorldModel
        broadcasts text embeddings here (reference WorldModel.predict,
        nn/tasks.py:654-680). Extra kwargs (e.g. dn=) pass through to the net.
        """
        if mutable is None:
            mutable = ["batch_stats"] if train else False
        return self._net_apply(variables, x, train=train, mutable=mutable, **kw)

    def _net_apply(self, variables, x, **kw):
        """net.apply, routed through the int8 interceptor when quantized.

        Training always runs full precision; quantization is inference-only
        (PTQ — reference analog: int8 export calibration, exporter.py:879)."""
        if self.quant is not None and not kw.get("train", False):
            from edgeyolo_tpu.nn.quant import quant_ctx

            with quant_ctx(self.quant):
                return self.net.apply(variables, x, **kw)
        return self.net.apply(variables, x, **kw)

    def quantize(self, calib_images, skip=(), variables=None, apply_kwargs=None):
        """Calibrate + enable int8 inference on this handle.

        calib_images: array/list of model-space inputs (B, H, W, 3) float in
        [0, 1] — e.g. a few val batches. Raw model.apply honors the active
        QuantState; the val/predict ENGINES treat their per-call int8 flag as
        authoritative (int8=False stashes the QuantState for the duration, a
        later int8=True reuses it), so pass int8=True to engine calls."""
        from edgeyolo_tpu.nn.quant import calibrate, quantize

        v = variables or self.variables
        assert v is not None, "call .init() or load weights first"
        if hasattr(calib_images, "ndim"):
            calib_images = [calib_images]
        scales = calibrate(self.net, v, calib_images, apply_kwargs=apply_kwargs)
        self.quant = quantize(v, scales, skip=skip)
        return self.quant

    def __call__(self, x, train: bool = False):
        assert self.variables is not None, "call .init() first"
        return self.apply(self.variables, x, train=train)

    def fuse(self):
        """Fold conv+BN in place (reference BaseModel.fuse, nn/tasks.py:214-242).

        Idempotent; the forward stays numerically identical. See fuse_conv_bn
        for why this is a no-op for XLA speed."""
        assert self.variables is not None, "call .init() or load weights first"
        self.variables = fuse_conv_bn(self.variables, eps=self.bn_eps)
        self.fused = True
        return self

    # -- introspection ----------------------------------------------------------
    def num_params(self, variables=None) -> int:
        v = variables or self.variables
        if v is None:
            return self.count_params()
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    def count_params(self, imgsz: int = 64) -> int:
        """Parameter count via abstract evaluation — no FLOPs, no device."""
        x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
        shapes = jax.eval_shape(lambda xx: self.net.init(jax.random.PRNGKey(0), xx, train=False), x)
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))

    def info(self, verbose: bool = True):
        n = self.num_params() if self.variables else None
        msg = f"{type(self).__name__}: {len(self.spec)} layers, {n} parameters, strides {self.stride}"
        if verbose:
            LOGGER.info(msg)
        return msg


class DetectionModel(BaseModel):
    task = "detect"

    def init_criterion(self):
        from edgeyolo_tpu.train.loss import DetectionLoss

        return DetectionLoss(self)


class SegmentationModel(DetectionModel):
    task = "segment"


class PoseModel(DetectionModel):
    task = "pose"


class OBBModel(DetectionModel):
    task = "obb"


class ClassificationModel(BaseModel):
    task = "classify"


class WorldModel(DetectionModel):
    """Open-vocabulary detector: classification via text-embedding similarity.

    set_classes() takes precomputed embeddings (K, gc) — CLIP text encoding is
    gated in this offline image (reference WorldModel.set_classes
    nn/tasks.py:633-652 calls clip; any embedding source of matching width
    plugs in here)."""

    def set_classes(self, embeddings, names=None, clip_npz=None, bpe_path=None):
        """embeddings: (K, 512) array, or a list of class-name STRINGS when
        clip_npz + bpe_path point at a ViT-B/32 text-tower dump and the public
        BPE merges file (weights-ready CLIP, nn/clip_text.py — reference
        set_classes encodes strings the same way, nn/tasks.py:633-652)."""
        import numpy as _np

        if isinstance(embeddings, (list, tuple)) and embeddings \
                and isinstance(embeddings[0], str):
            texts = list(embeddings)
            if not (clip_npz and bpe_path):
                raise ValueError(
                    "set_classes(strings) needs clip_npz= (ViT-B/32 text npz) and "
                    "bpe_path= (bpe_simple_vocab_16e6.txt.gz) — neither ships in "
                    "this image; pass precomputed (K, 512) embeddings instead")
            from edgeyolo_tpu.nn.clip_text import ClipBPETokenizer, load_clip_text

            tok = ClipBPETokenizer(bpe_path)
            model, variables = load_clip_text(clip_npz)
            embeddings = model.apply(variables, jnp.asarray(tok.tokenize(texts)))
            names = names or texts
        self.text = jnp.asarray(_np.asarray(embeddings), jnp.float32)[None]
        if names:
            self.names = dict(enumerate(names))
        self.nc = self.text.shape[1]

    def count_params(self, imgsz: int = 64) -> int:
        x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
        t = jax.ShapeDtypeStruct((1, self.nc, 512), jnp.float32)
        shapes = jax.eval_shape(
            lambda xx, tt: self.net.init(jax.random.PRNGKey(0), xx, train=False, text=tt), x, t)
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))

    def apply(self, variables, x, train: bool = False, mutable=None, **kw):
        assert getattr(self, "text", None) is not None, "call set_classes() first"
        if mutable is None:
            mutable = ["batch_stats"] if train else False
        b = x.shape[0]
        text = jnp.broadcast_to(self.text, (b, *self.text.shape[1:]))
        return self._net_apply(variables, x, train=train, text=text, mutable=mutable, **kw)

    def init(self, rng=0, imgsz: int = 640, batch: int = 1):
        rng = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
        x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        text = getattr(self, "text", None)
        if text is None:
            text = jnp.zeros((1, self.nc, 512), jnp.float32)
            self.text = text
        t = jnp.broadcast_to(text, (batch, *text.shape[1:]))
        self.variables = jax.jit(self.net.init, static_argnames=("train",))(rng, x, train=False, text=t)
        return self.variables


class RTDETRDetectionModel(DetectionModel):
    """RT-DETR query-based detector: predict/val plus CDN training via
    train/detr_loss.py (reference models/utils/loss.py RTDETRDetectionLoss,
    models/utils/ops.py get_cdn_group)."""

    task = "detect"


def guess_model_task(cfg: dict | str | Path) -> str:
    """Infer task from the head module name in a model config."""
    d = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
    head = d["head"][-1][2] if isinstance(d, dict) and "head" in d else ""
    if "Classify" in head:
        return "classify"
    if "Segment" in head:
        return "segment"
    if "Pose" in head:
        return "pose"
    if "OBB" in head:
        return "obb"
    return "detect"
