"""Torch checkpoint → flax variables converter.

Behavioral spec: the reference trains/ships torch `.pt` checkpoints
(ultralytics/nn/tasks.py:932 attempt_load_one_weight); this module lets
those weights load into the flax model tree so pretrained reference
checkpoints run here directly.

The mapping is rule-based, not a hand-written table: our module/param names
deliberately mirror the reference's (`l10_C2PSA/m_0/attn/pe/bn/scale` ↔
`model.10.m.0.attn.pe.bn.weight`), so conversion is a string rewrite plus
the layout transposes (conv OIHW→HWIO, linear (out,in)→(in,out)). Unmatched
keys on either side are reported loudly — silence means exact coverage.
"""

from __future__ import annotations

import re

import numpy as np

# flax leaf name -> torch suffix
_PARAM_SUFFIX = {"kernel": "weight", "scale": "weight", "bias": "bias",
                 "mean": "running_mean", "var": "running_var", "embedding": "weight"}


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    """Translate one flax param path to the reference state_dict key."""
    parts = list(path)
    # layer root: l{i}_{Type} -> model.{i}; a repeated plain module (yaml
    # n>1 outside the CSP-insert set) is built as l{i}_{Type}_{j} inside a
    # Sequential wrapper -> model.{i}.{j} (torch nn.Sequential indexing).
    # No registry type name ends in _<digit>, so the suffix is unambiguous.
    m = re.match(r"^l(\d+)_(.+)$", parts[0])
    if m:
        j = re.search(r"_(\d+)$", m.group(2))
        parts[0] = f"model.{m.group(1)}" + (f".{j.group(1)}" if j else "")
        if m.group(2).startswith("nn_ConvTranspose2d") and "conv_transpose" in parts:
            # raw torch ConvTranspose2d layer: weights live on the module
            # itself (model.{i}.weight), not under a wrapper child scope
            parts.remove("conv_transpose")
    out = []
    for p in parts[:-1]:
        # name_0 -> name.0, name_0_1 -> name.0.1 (nested ModuleList indexing)
        out.append(re.sub(r"_(?=\d+(?:_\d+)*$)", ".", p) if re.search(r"_\d+(?:_\d+)*$", p) else p)
    leaf = _PARAM_SUFFIX.get(parts[-1], parts[-1])
    key = ".".join(out + [leaf])
    # Proto's upsample is a RAW ConvTranspose2d in the reference (block.py
    # Proto), not the wrapped ConvTranspose module with its .conv_transpose
    key = key.replace("proto.upsample.conv_transpose.", "proto.upsample.")
    # GF2 quality mini-head: torch Sequential(conv, ReLU, conv, Sigmoid) puts
    # the second conv at index 2 (reference head.py:211-219); our flax names
    # only count parameterized layers (reg_conf_{i}_0 / _1)
    return re.sub(r"reg_conf\.(\d+)\.1\.", r"reg_conf.\1.2.", key)


def _to_flax(arr: np.ndarray, flax_shape: tuple[int, ...], leaf: str,
             is_convt: bool = False) -> np.ndarray | None:
    """Reshape/transpose a torch tensor into the flax layout; None if impossible.

    Kernels transpose BEFORE the identity-shape shortcut: a square torch
    Linear weight (out==in) has the same shape as the flax kernel but still
    needs the (out,in)->(in,out) transpose.

    `is_convt` MUST be passed for ConvTranspose kernels: torch's deconv weight
    is (in,out,kh,kw) applied spatially FLIPPED relative to flax.ConvTranspose.
    When in==out the regular-conv transpose produces the same SHAPE, so shape
    probing alone silently picks the wrong (channel-swapped, unflipped)
    transform — this corrupted Proto's square 256->256 upsample in every
    cross-framework segment run until round 5 (the reference read our masks
    through a scrambled proto branch and scored ~0.03 low).
    """
    if leaf == "kernel":
        if arr.ndim == 4 and is_convt:
            t = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            return t if t.shape == tuple(flax_shape) else None
        if arr.ndim == 4:  # conv OIHW -> HWIO (grouped convs transpose identically)
            t = arr.transpose(2, 3, 1, 0)
            if t.shape == tuple(flax_shape):
                return t
            # ConvTranspose reached without the hint (non-square channels
            # disambiguate by shape)
            t = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            if t.shape == tuple(flax_shape):
                return t
        if arr.ndim == 2:  # linear (out,in) -> (in,out)
            t = arr.T
            if t.shape == tuple(flax_shape):
                return t
    if tuple(arr.shape) == tuple(flax_shape):
        return arr
    if arr.size == int(np.prod(flax_shape)):
        return arr.reshape(flax_shape)
    return None


def convert_state_dict(torch_sd: dict, variables: dict, strict: bool = True,
                       rewrites: dict[str, str] | None = None,
                       key_fn=None) -> tuple[dict, dict]:
    """Fill a flax variables tree from a torch state_dict.

    Returns (new_variables, report). report = {"matched": n, "missing": [flax
    keys with no torch source], "unused": [torch keys never consumed],
    "shape_errors": [...]}. strict=True raises on any missing/shape error.
    """
    import jax

    sd = {k: np.asarray(v) for k, v in torch_sd.items()
          if not k.endswith("num_batches_tracked")}
    used = set()
    missing, shape_errors = [], []
    matched = 0

    flat = {}
    for coll, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            path = tuple(getattr(k, "key", str(k)) for k in kp)
            flat[(coll, path)] = leaf

    key_fn = key_fn or flax_path_to_torch_key
    new_flat = {}
    for (coll, path), leaf in flat.items():
        tk = key_fn(path)
        if rewrites and tk in rewrites:
            tk = rewrites[tk]
        if tk not in sd:
            missing.append(f"{coll}:{'/'.join(path)} -> {tk}")
            new_flat[(coll, path)] = leaf
            continue
        conv = _to_flax(sd[tk], tuple(leaf.shape), path[-1],
                        is_convt="conv_transpose" in path)
        if conv is None:
            shape_errors.append(f"{tk} {sd[tk].shape} vs {'/'.join(path)} {leaf.shape}")
            new_flat[(coll, path)] = leaf
        else:
            new_flat[(coll, path)] = conv.astype(np.asarray(leaf).dtype)
            matched += 1
            used.add(tk)

    report = {"matched": matched, "missing": missing,
              "unused": sorted(set(sd) - used), "shape_errors": shape_errors}
    if strict and (missing or shape_errors):
        raise ValueError(
            f"torch->flax conversion incomplete: {len(missing)} missing, "
            f"{len(shape_errors)} shape errors\nmissing: {missing[:10]}\n"
            f"shape: {shape_errors[:10]}")

    # rebuild nested dicts
    out: dict = {}
    for (coll, path), arr in new_flat.items():
        d = out.setdefault(coll, {})
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = np.asarray(arr)
    return out, report


def load_pt(path: str):
    """Read a torch checkpoint file into a flat {name: ndarray} state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# SAM name mapping: our flax module names -> the reference's torch names
# (models/sam/modules/{encoders,decoders,transformer}.py). Applied AFTER the
# generic rewrite; see sam_torch_key().
SAM_REWRITE_RULES = (
    (r"image_encoder\.patch_embed\.(weight|bias)$", r"image_encoder.patch_embed.proj.\1"),
    (r"\.block\.(\d+)\.", r".blocks.\1."),
    (r"mlp_lin(\d)", r"mlp.lin\1"),
    (r"prompt_encoder\.pe_gaussian$", "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    (r"prompt_encoder\.not_a_point_embed$", "prompt_encoder.not_a_point_embed.weight"),
    (r"prompt_encoder\.no_mask_embed$", "prompt_encoder.no_mask_embed.weight"),
    (r"prompt_encoder\.mask_down\.0\.", "prompt_encoder.mask_downscaling.0."),
    (r"prompt_encoder\.mask_down_ln0\.", "prompt_encoder.mask_downscaling.1."),
    (r"prompt_encoder\.mask_down\.1\.", "prompt_encoder.mask_downscaling.3."),
    (r"prompt_encoder\.mask_down_ln1\.", "prompt_encoder.mask_downscaling.4."),
    (r"prompt_encoder\.mask_down\.2\.", "prompt_encoder.mask_downscaling.6."),
    (r"mask_decoder\.iou_token$", "mask_decoder.iou_token.weight"),
    (r"mask_decoder\.mask_tokens$", "mask_decoder.mask_tokens.weight"),
    (r"mask_decoder\.layer\.(\d+)\.", r"mask_decoder.transformer.layers.\1."),
    (r"\.self_attn\.(q|k|v|out)\.", r".self_attn.\1_proj."),
    (r"\.cross_t2i\.(q|k|v|out)\.", r".cross_attn_token_to_image.\1_proj."),
    (r"\.cross_i2t\.(q|k|v|out)\.", r".cross_attn_image_to_token.\1_proj."),
    (r"mask_decoder\.final_attn\.(q|k|v|out)\.", r"mask_decoder.transformer.final_attn_token_to_image.\1_proj."),
    (r"mask_decoder\.final_norm\.", "mask_decoder.transformer.norm_final_attn."),
    (r"mask_decoder\.upscale\.0\.", "mask_decoder.output_upscaling.0."),
    (r"mask_decoder\.upscale_ln\.", "mask_decoder.output_upscaling.1."),
    (r"mask_decoder\.upscale\.1\.", "mask_decoder.output_upscaling.3."),
    (r"mask_decoder\.hyper_(\d)_l(\d)\.", r"mask_decoder.output_hypernetworks_mlps.\1.layers.\2."),
    (r"mask_decoder\.iou_l(\d)\.", r"mask_decoder.iou_prediction_head.layers.\1."),
)


def sam_torch_key(path: tuple) -> str:
    """flax path -> SAM reference state_dict key."""
    k = flax_path_to_torch_key(path)
    for pat, rep in SAM_REWRITE_RULES:
        k = re.sub(pat, rep, k)
    return k


def convert_sam_state_dict(torch_sd: dict, variables: dict, strict: bool = True):
    """convert_state_dict with the SAM name mapping; merges the reference's
    4 per-label point embeddings into our single (4, E) tensor."""
    sd = dict(torch_sd)
    pe_keys = [f"prompt_encoder.point_embeddings.{i}.weight" for i in range(4)]
    if all(k in sd for k in pe_keys):
        sd["prompt_encoder.point_embeddings"] = np.concatenate([sd.pop(k) for k in pe_keys], 0)
    return convert_state_dict(sd, variables, strict=strict, key_fn=sam_torch_key)


# RT-DETR name mapping (reference nn/modules/transformer.py RTDETRDecoder &
# friends). torch packs nn.MultiheadAttention projections into
# in_proj_weight; split_packed_attention() unpacks them into the per-dense
# keys our _mha layout uses.
RTDETR_REWRITE_RULES = (
    (r"\.enc\.(ma|fc1|fc2|norm1|norm2)", r".\1"),
    (r"\.input_proj_(\d)_conv\.", r".input_proj.\1.0."),
    (r"\.input_proj_(\d)_bn\.", r".input_proj.\1.1."),
    (r"\.decoder\.layer\.(\d+)\.", r".decoder.layers.\1."),
    (r"\.decoder\.bbox_head\.(\d+)\.", r".dec_bbox_head.\1."),
    (r"\.decoder\.score_head\.(\d+)\.", r".dec_score_head.\1."),
    (r"\.l(\d)\.(weight|bias)$", r".layers.\1.\2"),
    (r"\.denoising_class_embed$", ".denoising_class_embed.weight"),
    (r"\.tgt_embed$", ".tgt_embed.weight"),
)


def split_packed_attention(sd: dict) -> dict:
    """Unpack every torch nn.MultiheadAttention in_proj/out_proj into
    X_q/X_k/X_v/X_o dense keys."""
    sd = dict(sd)
    for k in [k for k in sd if k.endswith(".in_proj_weight")]:
        base = k[: -len(".in_proj_weight")]
        w = sd.pop(k)
        b = sd.pop(base + ".in_proj_bias")
        e = w.shape[1]
        for i, nm in enumerate("qkv"):
            sd[f"{base}_{nm}.weight"] = w[i * e : (i + 1) * e]
            sd[f"{base}_{nm}.bias"] = b[i * e : (i + 1) * e]
        sd[f"{base}_o.weight"] = sd.pop(base + ".out_proj.weight")
        sd[f"{base}_o.bias"] = sd.pop(base + ".out_proj.bias")
    return sd


def pack_attention(sd: dict) -> dict:
    """Inverse of split_packed_attention: repack X_q/X_k/X_v/X_o dense keys
    into torch nn.MultiheadAttention's in_proj_weight/in_proj_bias/out_proj.
    Needed on EXPORT so the reference can load_state_dict our MHA weights
    (reference AIFI `self.ma` and DeformableTransformerDecoderLayer
    `self.self_attn` are nn.MultiheadAttention, transformer.py:160,280)."""
    sd = dict(sd)
    for k in [k for k in sd if k.endswith("_q.weight")]:
        base = k[: -len("_q.weight")]
        if not all(f"{base}_{nm}.{p}" in sd for nm in "qkvo" for p in ("weight", "bias")):
            continue
        sd[base + ".in_proj_weight"] = np.concatenate(
            [sd.pop(f"{base}_{nm}.weight") for nm in "qkv"], axis=0)
        sd[base + ".in_proj_bias"] = np.concatenate(
            [sd.pop(f"{base}_{nm}.bias") for nm in "qkv"], axis=0)
        sd[base + ".out_proj.weight"] = sd.pop(base + "_o.weight")
        sd[base + ".out_proj.bias"] = sd.pop(base + "_o.bias")
    return sd


def rtdetr_torch_key(path: tuple) -> str:
    """flax path -> RT-DETR reference state_dict key."""
    k = flax_path_to_torch_key(path)
    for pat, rep in RTDETR_REWRITE_RULES:
        k = re.sub(pat, rep, k)
    return k


def export_rtdetr_state_dict(variables: dict) -> dict:
    """export_state_dict with the RT-DETR name mapping + attention repack —
    the exact inverse of convert_rtdetr_state_dict."""
    return pack_attention(export_state_dict(variables, key_fn=rtdetr_torch_key))


def convert_rtdetr_state_dict(torch_sd: dict, variables: dict, strict: bool = True):
    """convert_state_dict with the RT-DETR name mapping + attention unpack."""
    return convert_state_dict(split_packed_attention(torch_sd), variables,
                              strict=strict, key_fn=rtdetr_torch_key)


# SAM2 name mapping (reference models/sam/modules/{encoders,decoders,
# memory_attention,blocks}.py; SAM2Model attribute layout sam.py:105-345).
SAM2_REWRITE_RULES = (
    # trunk
    (r"image_encoder\.trunk\.patch_embed\.(kernel|weight|bias)", r"image_encoder.trunk.patch_embed.proj.\1"),
    (r"image_encoder\.trunk\.block\.(\d+)\.", r"image_encoder.trunk.blocks.\1."),
    (r"\.attn\.qkv\.", ".attn.qkv."),
    (r"\.mlp\.0\.", ".mlp.layers.0."),
    (r"\.mlp\.1\.", ".mlp.layers.1."),
    # neck
    (r"image_encoder\.neck\.conv\.(\d+)\.", r"image_encoder.neck.convs.\1.conv."),
    # decoder high-res projections live inside the reference decoder
    (r"^conv_s0\.", "sam_mask_decoder.conv_s0."),
    (r"^conv_s1\.", "sam_mask_decoder.conv_s1."),
    # prompt encoder (same structure as SAM1, different prefix)
    (r"^prompt_encoder\.pe_gaussian$", "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    (r"^prompt_encoder\.not_a_point_embed$", "sam_prompt_encoder.not_a_point_embed.weight"),
    (r"^prompt_encoder\.no_mask_embed$", "sam_prompt_encoder.no_mask_embed.weight"),
    (r"^prompt_encoder\.point_embeddings$", "sam_prompt_encoder.point_embeddings"),
    (r"^prompt_encoder\.mask_down\.0\.", "sam_prompt_encoder.mask_downscaling.0."),
    (r"^prompt_encoder\.mask_down_ln0\.", "sam_prompt_encoder.mask_downscaling.1."),
    (r"^prompt_encoder\.mask_down\.1\.", "sam_prompt_encoder.mask_downscaling.3."),
    (r"^prompt_encoder\.mask_down_ln1\.", "sam_prompt_encoder.mask_downscaling.4."),
    (r"^prompt_encoder\.mask_down\.2\.", "sam_prompt_encoder.mask_downscaling.6."),
    # mask decoder
    (r"^mask_decoder\.obj_score_token$", "sam_mask_decoder.obj_score_token.weight"),
    (r"^mask_decoder\.iou_token$", "sam_mask_decoder.iou_token.weight"),
    (r"^mask_decoder\.mask_tokens$", "sam_mask_decoder.mask_tokens.weight"),
    (r"^mask_decoder\.layer\.(\d+)\.", r"sam_mask_decoder.transformer.layers.\1."),
    (r"\.self_attn\.(q|k|v|out)\.", r".self_attn.\1_proj."),
    (r"\.cross_t2i\.(q|k|v|out)\.", r".cross_attn_token_to_image.\1_proj."),
    (r"\.cross_i2t\.(q|k|v|out)\.", r".cross_attn_image_to_token.\1_proj."),
    (r"mlp_lin1\.", "mlp.layers.0."),
    (r"mlp_lin2\.", "mlp.layers.1."),
    (r"^mask_decoder\.final_attn\.(q|k|v|out)\.", r"sam_mask_decoder.transformer.final_attn_token_to_image.\1_proj."),
    (r"^mask_decoder\.final_norm\.", "sam_mask_decoder.transformer.norm_final_attn."),
    (r"^mask_decoder\.upscale\.0\.", "sam_mask_decoder.output_upscaling.0."),
    (r"^mask_decoder\.upscale_ln\.", "sam_mask_decoder.output_upscaling.1."),
    (r"^mask_decoder\.upscale\.1\.", "sam_mask_decoder.output_upscaling.3."),
    (r"^mask_decoder\.hyper\.(\d+)\.l(\d)\.", r"sam_mask_decoder.output_hypernetworks_mlps.\1.layers.\2."),
    (r"^mask_decoder\.iou_head\.l(\d)\.", r"sam_mask_decoder.iou_prediction_head.layers.\1."),
    (r"^mask_decoder\.obj_score_head\.l(\d)\.", r"sam_mask_decoder.pred_obj_score_head.layers.\1."),
    (r"^mask_decoder\.", "sam_mask_decoder."),
    # memory attention (names align; only layer_{i} -> layers.{i})
    (r"^memory_attention\.layer\.(\d+)\.", r"memory_attention.layers.\1."),
    # memory encoder
    (r"^memory_encoder\.mask_down\.(\d)\.", lambda m: f"memory_encoder.mask_downsampler.encoder.{3 * int(m.group(1))}."),
    (r"^memory_encoder\.mask_down_ln(\d)\.", lambda m: f"memory_encoder.mask_downsampler.encoder.{3 * int(m.group(1)) + 1}."),
    (r"^memory_encoder\.mask_down_out\.", "memory_encoder.mask_downsampler.encoder.12."),
    (r"^memory_encoder\.fuser\.(\d)\.", r"memory_encoder.fuser.layers.\1."),
    # object pointer MLP
    (r"^obj_ptr_proj\.l(\d)\.", r"obj_ptr_proj.layers.\1."),
)


def sam2_torch_key(path: tuple) -> str:
    """flax path -> SAM2 reference state_dict key."""
    k = flax_path_to_torch_key(path)
    for pat, rep in SAM2_REWRITE_RULES:
        k = re.sub(pat, rep, k)
    return k


def convert_sam2_state_dict(torch_sd: dict, variables: dict, strict: bool = True):
    """convert_state_dict with the SAM2 name mapping. Handles the NCHW->NHWC
    transpose of the trunk pos embeddings and merges the 4 per-label point
    embeddings like the SAM1 converter."""
    sd = {k: np.asarray(v) for k, v in torch_sd.items()}
    for k in ("image_encoder.trunk.pos_embed", "image_encoder.trunk.pos_embed_window"):
        if k in sd and sd[k].ndim == 4:
            sd[k] = sd[k].transpose(0, 2, 3, 1)  # (1,C,h,w) -> (1,h,w,C)
    pe_keys = [f"sam_prompt_encoder.point_embeddings.{i}.weight" for i in range(4)]
    if all(k in sd for k in pe_keys):
        sd["sam_prompt_encoder.point_embeddings"] = np.concatenate(
            [sd.pop(k) for k in pe_keys], 0)
    return convert_state_dict(sd, variables, strict=strict, key_fn=sam2_torch_key)


# MobileSAM TinyViT name mapping (reference models/sam/modules/tiny_encoder.py;
# our flax layout nn/tinyvit.py).
TINYVIT_REWRITE_RULES = (
    (r"image_encoder\.patch_embed\.0\.", "image_encoder.patch_embed.seq.0."),
    (r"image_encoder\.patch_embed\.1\.", "image_encoder.patch_embed.seq.2."),
    (r"image_encoder\.s0_mb(\d+)\.", r"image_encoder.layers.0.blocks.\1."),
    (r"image_encoder\.s0_merge\.", "image_encoder.layers.0.downsample."),
    (r"image_encoder\.s(\d)_blk(\d+)\.", r"image_encoder.layers.\1.blocks.\2."),
    (r"image_encoder\.s(\d)_merge\.", r"image_encoder.layers.\1.downsample."),
    (r"\.mlp_norm\.", ".mlp.norm."),
    (r"\.mlp_fc(\d)\.", r".mlp.fc\1."),
    (r"\.attn\.attention_biases$", ".attn.attention_biases"),
)


def mobile_sam_torch_key(path: tuple) -> str:
    """flax path -> MobileSAM reference state_dict key (TinyViT encoder +
    the shared SAM prompt/decoder mapping)."""
    k = sam_torch_key(path)
    for pat, rep in TINYVIT_REWRITE_RULES:
        k = re.sub(pat, rep, k)
    return k


def convert_mobile_sam_state_dict(torch_sd: dict, variables: dict, strict: bool = True):
    """convert_state_dict with the MobileSAM (TinyViT) name mapping."""
    sd = dict(torch_sd)
    pe_keys = [f"prompt_encoder.point_embeddings.{i}.weight" for i in range(4)]
    if all(k in sd for k in pe_keys):
        sd["prompt_encoder.point_embeddings"] = np.concatenate([sd.pop(k) for k in pe_keys], 0)
    return convert_state_dict(sd, variables, strict=strict, key_fn=mobile_sam_torch_key)


def export_state_dict(variables: dict, key_fn=None) -> dict:
    """Inverse converter: flax variables -> a torch-keyed numpy state_dict.

    Lets the REFERENCE tooling consume models trained here (cross-framework
    val parity, interop). Layout transforms are the inverse of _to_flax:
    conv HWIO -> OIHW, linear (in,out) -> (out,in), BN stats to
    running_mean/var. Scalars/1-D leaves pass through. Note: torch Linear and
    square conv kernels are disambiguated by rank, exactly as in _to_flax.
    """
    import jax

    key_fn = key_fn or flax_path_to_torch_key
    out: dict[str, np.ndarray] = {}
    for coll, tree in variables.items():
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = tuple(getattr(k, "key", str(k)) for k in kp)
            tk = key_fn(path)
            arr = np.asarray(leaf)
            leafname = path[-1]
            if leafname == "kernel":
                if arr.ndim == 4 and "conv_transpose" in path:
                    # inverse of _to_flax's convT rule: (kh,kw,in,out) ->
                    # torch (in,out,kh,kw) spatially flipped. The generic conv
                    # transform has the same SHAPE when in==out (Proto's
                    # square upsample) but scrambles the deconv semantics.
                    arr = arr.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
                elif arr.ndim == 4:    # HWIO -> OIHW
                    arr = arr.transpose(3, 2, 0, 1)
                elif arr.ndim == 2:    # (in, out) -> (out, in)
                    arr = arr.T
            out[tk] = np.ascontiguousarray(arr)
    return out
