"""SAM2: Hiera image encoder + FPN neck + memory attention/encoder + SAM2
mask decoder — TPU-native (flax, NHWC, static shapes).

Behavioral spec (reference, ultralytics/models/sam/):
  modules/encoders.py:645-794 (Hiera trunk: windowed pos embed, MultiScale
  blocks with q-pooling, global attention blocks), :501-644 (FpnNeck, nearest
  top-down on levels [2,3]), :378-446 (MemoryEncoder: MaskDownSampler +
  CXBlock fuser), :446-500 (ImageEncoder, scalp=1);
  modules/blocks.py:405-480 (RoPEAttention), :583-696 (MultiScaleBlock),
  :722-811 (PositionEmbeddingSine), :62-109 (MaskDownSampler),
  :146-205 (CXBlock);
  modules/memory_attention.py (MemoryAttentionLayer/MemoryAttention);
  modules/decoders.py:176-518 (SAM2MaskDecoder: obj-score token, high-res
  skip features, dynamic multimask via stability);
  modules/sam.py:105-1013 (SAM2Model: _forward_sam_heads, memory-conditioned
  features, _encode_new_memory, track_step);
  build.py:68-119,216-310 (sam2 t/s/b/l configs).

Design notes (TPU-first): everything is channels-last and statically shaped
per trace. The memory bank lives on the HOST (engine/sam2.py) as numpy; each
track step calls jitted methods whose shapes depend only on (n_mem_frames,
n_obj_ptr_tokens) — a small bounded set (ramps to num_maskmem=7 then stays
constant), so XLA compiles a handful of programs once and reuses them for the
rest of the video. RoPE tables are computed at trace time as constants.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edgeyolo_tpu.nn.sam import PromptEncoder, _TwoWayBlock, _XAttn

KINIT = nn.initializers.lecun_normal()
NO_OBJ_SCORE = -1024.0


# --------------------------------------------------------------------------
# positional encodings
# --------------------------------------------------------------------------
def sine_pos_embed_2d(h: int, w: int, num_pos_feats: int = 128,
                      temperature: float = 10000.0) -> np.ndarray:
    """PositionEmbeddingSine (blocks.py:722-811), normalized; returns
    (h, w, 2*num_pos_feats) with channel order [pos_y, pos_x]."""
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], -1).astype(np.float32)


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """1D sinusoid over normalized positions (utils.py:63-71). pos (N,)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def _axial_rope_table(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """compute_axial_cis (utils.py:82-92) as (N, dim/2) cos/sin tables."""
    n_f = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:n_f].astype(np.float64) / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    tx = t % end_x
    ty = np.floor(t / end_x)
    fx = np.outer(tx, freqs)  # (N, dim/4)
    fy = np.outer(ty, freqs)
    ang = np.concatenate([fx, fy], -1)  # (N, dim/2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _apply_rope(x, cos, sin):
    """Rotate pairs: x (..., N, D) with tables (N, D/2)."""
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    or_ = xr * cos - xi * sin
    oi = xr * sin + xi * cos
    return jnp.stack([or_, oi], axis=-1).reshape(x.shape)


# --------------------------------------------------------------------------
# Hiera trunk
# --------------------------------------------------------------------------
def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero pad; returns padded hw."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(wins, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp // ws * (Wp // ws))
    x = wins.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _max_pool2(x):
    """2x2 stride-2 max pool, NHWC (do_pool, blocks.py:488-500)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _MSAttention(nn.Module):
    """MultiScaleAttention (blocks.py:503-580)."""

    dim_out: int
    num_heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        qkv = nn.Dense(self.dim_out * 3, kernel_init=KINIT, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = _max_pool2(q.reshape(B, H, W, -1))
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.num_heads, -1)
        hd = q.shape[-1]
        attn = jnp.einsum("bqhc,bkhc->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, H, W, -1)
        return nn.Dense(self.dim_out, kernel_init=KINIT, name="proj")(o)


class _MSBlock(nn.Module):
    """MultiScaleBlock (blocks.py:583-696)."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: bool = False  # True => 2x2 q-pool at this block
    window_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, kernel_init=KINIT, name="proj")(x)
            if self.q_stride:
                shortcut = _max_pool2(shortcut)
            # reference order: proj(x) then pool (do_pool)
        ws = self.window_size
        H, W = x.shape[1:3]
        if ws > 0:
            x, pad_hw = _window_partition(x, ws)
        x = _MSAttention(self.dim_out, self.num_heads, q_pool=self.q_stride,
                         name="attn")(x)
        if self.q_stride:
            ws = ws // 2
            H2, W2 = shortcut.shape[1:3]
            pad_hw = ((H2 + (ws - H2 % ws) % ws) if ws else H2,
                      (W2 + (ws - W2 % ws) % ws) if ws else W2)
            H, W = H2, W2
        if self.window_size > 0:
            x = _window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim_out * self.mlp_ratio), kernel_init=KINIT, name="mlp_0")(y)
        y = nn.Dense(self.dim_out, kernel_init=KINIT, name="mlp_1")(jax.nn.gelu(h, approximate=False))
        return x + y


class Hiera(nn.Module):
    """Hiera trunk (encoders.py:645-794): returns per-stage NHWC features."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Sequence[int] = (7, 7)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    q_pool: int = 3

    @nn.compact
    def __call__(self, x):
        ed = self.embed_dim
        x = nn.Conv(ed, (7, 7), strides=(4, 4), padding=[(3, 3), (3, 3)],
                    kernel_init=KINIT, name="patch_embed")(x)
        H, W = x.shape[1:3]
        bg = self.param("pos_embed", nn.initializers.zeros,
                        (1, *self.window_pos_embed_bkg_spatial_size, ed))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0], ed))
        pos = jax.image.resize(bg, (1, H, W, ed), method="cubic")
        tiles = (1, H // win.shape[1], W // win.shape[2], 1)
        pos = pos + jnp.tile(win, tiles)
        x = x + pos

        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]
        outputs = []
        dim, heads, cur_stage = ed, self.num_heads, 1
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * 2)
                heads = int(heads * 2)
                cur_stage += 1
            x = _MSBlock(dim, dim_out, heads, q_stride=(i in q_pool_blocks),
                         window_size=window_size, name=f"block_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # high-res first


class FpnNeck(nn.Module):
    """FPN neck (encoders.py:501-644): lateral 1x1 + nearest top-down on
    fpn_top_down_levels, sine positional encodings."""

    d_model: int = 256
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    fpn_top_down_levels: Sequence[int] = (2, 3)

    @nn.compact
    def __call__(self, xs):
        # xs: high-res first (stage order); convs[j] maps channel_list[j]
        # (lowest-res first); out index i corresponds to xs[i]
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), kernel_init=KINIT,
                              name=f"conv_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                up = jnp.repeat(jnp.repeat(prev.astype(jnp.float32), 2, axis=1), 2, axis=2)
                prev = lateral + up
            else:
                prev = lateral
            out[i] = prev
            pe = sine_pos_embed_2d(prev.shape[1], prev.shape[2], self.d_model // 2)
            pos[i] = jnp.broadcast_to(jnp.asarray(pe)[None], prev.shape)
        return out, pos


class ImageEncoder(nn.Module):
    """Trunk + neck with scalp (encoders.py:446-500)."""

    trunk: Any
    neck: Any
    scalp: int = 1

    def __call__(self, x):
        feats, pos = self.neck(self.trunk(x))
        if self.scalp > 0:
            feats, pos = feats[: -self.scalp], pos[: -self.scalp]
        return {"vision_features": feats[-1], "vision_pos_enc": pos,
                "backbone_fpn": feats}


# --------------------------------------------------------------------------
# memory encoder
# --------------------------------------------------------------------------
class _CXBlock(nn.Module):
    """ConvNeXt block (blocks.py:146-205), NHWC."""

    dim: int

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, kernel_init=KINIT, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, kernel_init=KINIT, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=KINIT, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """Fuses pixel features + mask into the 64-d memory (encoders.py:378-445)."""

    out_dim: int = 64
    in_dim: int = 256

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat (B, H, W, 256); masks (B, 16H, 16W, 1) already sigmoided/
        scaled. Returns (features (B,H,W,out_dim), pos (H,W,out_dim))."""
        m = masks
        chans = 1
        for li in range(4):  # total_stride 16 = 2^4 (MaskDownSampler)
            chans = chans * 4
            m = nn.Conv(chans, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        kernel_init=KINIT, name=f"mask_down_{li}")(m)
            m = nn.LayerNorm(epsilon=1e-6, name=f"mask_down_ln{li}")(m)
            m = jax.nn.gelu(m, approximate=False)
        m = nn.Conv(self.in_dim, (1, 1), kernel_init=KINIT, name="mask_down_out")(m)

        x = nn.Conv(self.in_dim, (1, 1), kernel_init=KINIT, name="pix_feat_proj")(pix_feat)
        x = x + m
        x = _CXBlock(self.in_dim, name="fuser_0")(x)
        x = _CXBlock(self.in_dim, name="fuser_1")(x)
        x = nn.Conv(self.out_dim, (1, 1), kernel_init=KINIT, name="out_proj")(x)
        pos = jnp.asarray(sine_pos_embed_2d(x.shape[1], x.shape[2], self.out_dim // 2))
        return x, pos


# --------------------------------------------------------------------------
# memory attention (RoPE)
# --------------------------------------------------------------------------
class _RoPEAttention(nn.Module):
    """RoPEAttention (blocks.py:405-480): axial rotary enc on q and the
    spatial prefix of k. kv_in_dim allows 64-d memory keys/values."""

    dim: int = 256
    num_heads: int = 1
    kv_in_dim: int | None = None
    rope_k_repeat: bool = False

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0):
        d = self.dim
        qp = nn.Dense(d, kernel_init=KINIT, name="q_proj")(q)
        kp = nn.Dense(d, kernel_init=KINIT, name="k_proj")(k)
        vp = nn.Dense(d, kernel_init=KINIT, name="v_proj")(v)
        B, Nq, _ = qp.shape
        Nk = kp.shape[1]
        h = self.num_heads
        hd = d // h
        qh = qp.reshape(B, Nq, h, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)

        side = int(round(math.sqrt(Nq)))
        cos, sin = _axial_rope_table(hd, side, side)
        cos = jnp.asarray(cos)
        sin = jnp.asarray(sin)
        qh = _apply_rope(qh, cos, sin)
        n_rope = Nk - num_k_exclude_rope
        if n_rope > 0:
            k_rope = kh[:, :, :n_rope]
            if self.rope_k_repeat and n_rope != Nq:
                r = n_rope // Nq
                cos_k = jnp.tile(cos, (r, 1))
                sin_k = jnp.tile(sin, (r, 1))
            else:
                cos_k, sin_k = cos, sin
            k_rope = _apply_rope(k_rope, cos_k, sin_k)
            kh = jnp.concatenate([k_rope, kh[:, :, n_rope:]], axis=2)

        attn = jnp.einsum("bhqc,bhkc->bhqk", qh, kh) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, Nq, d)
        return nn.Dense(d, kernel_init=KINIT, name="out_proj")(o)


class MemoryAttentionLayer(nn.Module):
    """Self-attn + cross-attn to memory + FFN (memory_attention.py:12-140)."""

    d_model: int = 256
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, num_k_exclude_rope: int = 0):
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        t2 = _RoPEAttention(self.d_model, 1, name="self_attn")(t2, t2, t2)
        tgt = tgt + t2
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        t2 = _RoPEAttention(self.d_model, 1, kv_in_dim=64, rope_k_repeat=True,
                            name="cross_attn_image")(
            t2, memory + pos, memory, num_k_exclude_rope=num_k_exclude_rope)
        tgt = tgt + t2
        t2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        h = nn.Dense(self.dim_feedforward, kernel_init=KINIT, name="linear1")(t2)
        t2 = nn.Dense(self.d_model, kernel_init=KINIT, name="linear2")(jax.nn.relu(h))
        return tgt + t2


class MemoryAttention(nn.Module):
    """Stack of memory attention layers (memory_attention.py:142-237)."""

    d_model: int = 256
    num_layers: int = 4

    @nn.compact
    def __call__(self, curr, memory, curr_pos, memory_pos, num_obj_ptr_tokens: int = 0):
        """curr (B, N, 256); memory (B, M, 64); poses alike. Batch-first."""
        out = curr + 0.1 * curr_pos  # pos_enc_at_input
        for i in range(self.num_layers):
            out = MemoryAttentionLayer(self.d_model, name=f"layer_{i}")(
                out, memory, memory_pos, curr_pos,
                num_k_exclude_rope=num_obj_ptr_tokens)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out)


# --------------------------------------------------------------------------
# SAM2 mask decoder
# --------------------------------------------------------------------------
class _MLP3(nn.Module):
    hidden: int
    out: int
    depth: int = 3
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, kernel_init=KINIT, name=f"l{i}")(x))
        x = nn.Dense(self.out, kernel_init=KINIT, name=f"l{self.depth - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


class SAM2MaskDecoder(nn.Module):
    """SAM2 decoder (decoders.py:176-518): obj-score token + iou token +
    4 mask tokens through the two-way transformer; high-res skip features in
    the upscaling path; per-token hypernetwork MLPs; stability-based dynamic
    multimask selection happens in the caller."""

    dim: int = 256
    heads: int = 8
    depth: int = 2
    num_mask_tokens: int = 4

    @nn.compact
    def __call__(self, img_embed, dense_pe, sparse, dense, feat_s0, feat_s1):
        B = sparse.shape[0]
        E = self.dim
        obj_tok = self.param("obj_score_token", nn.initializers.normal(1.0), (1, E))
        iou_tok = self.param("iou_token", nn.initializers.normal(1.0), (1, E))
        mask_tok = self.param("mask_tokens", nn.initializers.normal(1.0),
                              (self.num_mask_tokens, E))
        toks = jnp.concatenate([obj_tok, iou_tok, mask_tok], 0)[None]
        toks = jnp.broadcast_to(toks, (B, toks.shape[1], E))
        queries = jnp.concatenate([toks, sparse], axis=1)

        g = img_embed.shape[1]
        keys = (img_embed + dense).reshape(B, g * g, E)
        kpe = jnp.broadcast_to(dense_pe.reshape(1, g * g, E), (B, g * g, E))
        qpe = queries
        for i in range(self.depth):
            queries, keys = _TwoWayBlock(E, self.heads, skip_first_pe=(i == 0),
                                         name=f"layer_{i}")(queries, keys, qpe, kpe)
        q = queries + qpe
        k = keys + kpe
        queries = nn.LayerNorm(epsilon=1e-5, name="final_norm")(
            queries + _XAttn(E, self.heads, 2, name="final_attn")(q, k, keys))

        obj_out = queries[:, 0]
        iou_out = queries[:, 1]
        mask_out = queries[:, 2 : 2 + self.num_mask_tokens]

        src = keys.reshape(B, g, g, E)
        up = nn.ConvTranspose(E // 4, (2, 2), strides=(2, 2), kernel_init=KINIT,
                              name="upscale_0")(src) + feat_s1
        up = jax.nn.gelu(nn.LayerNorm(name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(E // 8, (2, 2), strides=(2, 2), kernel_init=KINIT,
                              name="upscale_1")(up) + feat_s0
        up = jax.nn.gelu(up, approximate=False)

        hyper = []
        for i in range(self.num_mask_tokens):
            hyper.append(_MLP3(E, E // 8, name=f"hyper_{i}")(mask_out[:, i]))
        hyper = jnp.stack(hyper, 1)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)

        iou_pred = _MLP3(E, self.num_mask_tokens, sigmoid=True, name="iou_head")(iou_out)
        obj_logits = _MLP3(E, 1, name="obj_score_head")(obj_out)
        return masks, iou_pred, mask_out, obj_logits


# --------------------------------------------------------------------------
# SAM2 model
# --------------------------------------------------------------------------
class SAM2Model(nn.Module):
    """Promptable image + video segmentation. Methods are entry points for
    jit via apply(..., method=...):

      encode_image(x)            -> dict of projected fpn feats + pos
      sam_heads(...)             -> (low_res, high_res, ious, best_low,
                                     best_high, obj_ptr, obj_logits)
      condition_features(...)    -> memory-conditioned stride-16 features
      encode_memory(...)         -> (maskmem_features, maskmem_pos)
      tpos_ptr(...)              -> obj-pointer temporal sine embedding
    """

    image_size: int = 1024
    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    window_pos_embed_bkg_spatial_size: Sequence[int] = (7, 7)
    backbone_channel_list: Sequence[int] = (768, 384, 192, 96)
    num_maskmem: int = 7
    mem_dim: int = 64
    hidden_dim: int = 256
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0

    def setup(self):
        self.image_encoder = ImageEncoder(
            trunk=Hiera(embed_dim=self.embed_dim, num_heads=self.num_heads,
                        stages=self.stages, global_att_blocks=self.global_att_blocks,
                        window_pos_embed_bkg_spatial_size=self.window_pos_embed_bkg_spatial_size,
                        window_spec=self.window_spec),
            neck=FpnNeck(d_model=self.hidden_dim,
                         backbone_channel_list=self.backbone_channel_list),
            scalp=1,
        )
        self.prompt_encoder = PromptEncoder(embed_dim=self.hidden_dim,
                                            grid=self.image_size // 16)
        self.mask_decoder = SAM2MaskDecoder(dim=self.hidden_dim)
        self.conv_s0 = nn.Conv(self.hidden_dim // 8, (1, 1), kernel_init=KINIT)
        self.conv_s1 = nn.Conv(self.hidden_dim // 4, (1, 1), kernel_init=KINIT)
        self.memory_attention = MemoryAttention(d_model=self.hidden_dim)
        self.memory_encoder = MemoryEncoder(out_dim=self.mem_dim, in_dim=self.hidden_dim)
        self.obj_ptr_proj = _MLP3(self.hidden_dim, self.hidden_dim)
        # downsample a full-res mask input to the SAM prompt resolution
        # (sam.py SAM2Model.mask_downsample, used by _use_mask_as_output)
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4), kernel_init=KINIT)
        self.no_mem_embed = self.param("no_mem_embed",
                                       nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc",
                                         nn.initializers.normal(0.02), (1, 1, self.hidden_dim))
        self.no_obj_ptr = self.param("no_obj_ptr",
                                     nn.initializers.normal(0.02), (1, self.hidden_dim))
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (self.num_maskmem, 1, 1, self.mem_dim))

    # -- image path ------------------------------------------------------------
    def encode_image(self, x):
        """x (B, S, S, 3) normalized. Returns dict: feat_s0 (stride4, E/8
        projected), feat_s1 (stride8, E/4 projected), feat (stride16, 256),
        pos (stride16 sine)."""
        out = self.image_encoder(x)
        fpn = out["backbone_fpn"]
        return {
            "feat_s0": self.conv_s0(fpn[0]),
            "feat_s1": self.conv_s1(fpn[1]),
            "feat": fpn[2],
            "pos": out["vision_pos_enc"][2],
        }

    def sam_heads(self, feat, points, labels, feat_s0, feat_s1,
                  mask_inputs=None, multimask_output: bool = False):
        """SAM prompt encoder + mask decoder (sam.py:392-547).

        feat (B, g, g, 256) memory-conditioned stride-16 features;
        points (B, P, 2) in [0,1]; labels (B, P) with -1 padding;
        mask_inputs optional (B, 4g, 4g, 1) low-res-x4 mask logits.
        """
        B = feat.shape[0]
        sparse, dense, dense_pe = self.prompt_encoder(points, labels, mask_inputs)
        masks, ious, mask_toks, obj_logits = self.mask_decoder(
            feat, dense_pe, sparse, dense, feat_s0, feat_s1)
        # hard no-obj gate on spatial logits
        is_obj = obj_logits > 0  # (B, 1)
        masks = jnp.where(is_obj[..., None, None], masks, NO_OBJ_SCORE)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_ious = ious[:, 1:]
            best = jnp.argmax(out_ious, axis=-1)
            bidx = jnp.arange(B)
            low_res = out_masks[bidx, best][:, None]
            sam_tok = mask_toks[bidx, 1 + best]
        else:
            # dynamic multimask via stability (decoders.py:456-518)
            s0 = masks[:, 0]
            flat = s0.reshape(B, -1)
            area_i = jnp.sum(flat > 0.05, -1).astype(jnp.float32)
            area_u = jnp.sum(flat > -0.05, -1).astype(jnp.float32)
            stability = jnp.where(area_u > 0, area_i / area_u, 1.0)
            stable = stability >= 0.98
            mm = masks[:, 1:]
            mi = ious[:, 1:]
            best = jnp.argmax(mi, axis=-1)
            bidx = jnp.arange(B)
            alt = mm[bidx, best]
            low_res = jnp.where(stable[:, None, None], s0, alt)[:, None]
            out_masks = low_res
            out_ious = jnp.where(stable[:, None], ious[:, :1], mi[bidx, best][:, None])
            sam_tok = mask_toks[:, 0]

        S = self.image_size
        hi = jax.image.resize(low_res, (B, 1, S, S), method="bilinear")
        obj_ptr = self.obj_ptr_proj(sam_tok)
        lam = is_obj.astype(jnp.float32)  # fixed_no_obj_ptr (hard lambda)
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return out_masks, out_ious, low_res, hi, obj_ptr, obj_logits[:, 0]

    # -- memory path ------------------------------------------------------------
    def condition_features(self, feat, pos, memory, memory_pos,
                           num_obj_ptr_tokens: int = 0):
        """Fuse the current frame's stride-16 features with the memory bank
        (sam.py:620-783). feat/pos (B, g, g, 256); memory (B, M, 64)."""
        B, g, _, C = feat.shape
        cur = feat.reshape(B, g * g, C)
        cur_pos = pos.reshape(B, g * g, C)
        out = self.memory_attention(cur, memory, cur_pos, memory_pos,
                                    num_obj_ptr_tokens=num_obj_ptr_tokens)
        return out.reshape(B, g, g, C)

    def no_memory_features(self, feat):
        """Initial conditioning frame: directly add the no-mem embedding."""
        return feat + self.no_mem_embed[0, 0]

    def encode_memory(self, feat, high_res_masks, obj_logits, binarize: bool = False):
        """Encode (features, predicted mask) into a memory slot
        (sam.py:784-827). high_res_masks (B, S, S, 1) logits."""
        if binarize:
            m = (high_res_masks > 0).astype(jnp.float32)
        else:
            m = jax.nn.sigmoid(high_res_masks)
        m = m * self.sigmoid_scale_for_mem_enc + self.sigmoid_bias_for_mem_enc
        feats, pos = self.memory_encoder(feat, m)
        return feats, pos

    def tpos_ptr(self, pos_norm):
        """Temporal sine embedding for object pointers (sam.py:736-745).
        pos_norm (N,) = t_diff / t_diff_max."""
        return get_1d_sine_pe(pos_norm, self.mem_dim)

    def __call__(self, x, points, labels):
        """Init/dry-run path: encode + no-mem conditioning + SAM heads."""
        enc = self.encode_image(x)
        feat = self.no_memory_features(enc["feat"])
        B, g = feat.shape[0], feat.shape[1]
        # materialize the prompt-encoder mask-down params (used by the video
        # predictor's prev-mask path)
        _ = self.prompt_encoder(points, labels, jnp.zeros((B, 4 * g, 4 * g, 1)))
        out = self.sam_heads(feat, points, labels, enc["feat_s0"], enc["feat_s1"])
        # touch the memory path so all params materialize at init; masks to
        # the memory encoder ride NHWC
        hi_nhwc = jnp.transpose(out[3], (0, 2, 3, 1))
        mem, mem_pos = self.encode_memory(enc["feat"], hi_nhwc, out[5])
        memory = mem.reshape(B, -1, self.mem_dim)
        # temporal embedding rides the position stream (sam.py:713)
        mpos = jnp.broadcast_to(mem_pos.reshape(1, -1, self.mem_dim),
                                memory.shape) + self.maskmem_tpos_enc[0, 0]
        cond = self.condition_features(enc["feat"], enc["pos"], memory, mpos)
        _ = self.tpos_ptr(jnp.zeros((1,)))
        _ = self.mask_downsample(jnp.zeros((B, 4 * g, 4 * g, 1)))
        _ = self.no_mem_pos_enc, self.no_obj_ptr
        return out[0], out[1], cond

    def downsample_mask(self, m):
        """(B, S, S, 1) -> (B, S/4, S/4, 1) prompt-resolution mask input."""
        return self.mask_downsample(m)


SAM2_CONFIGS = {
    # (embed_dim, stages, num_heads, global_att_blocks, window_spec,
    #  backbone_channel_list, window_pos_embed_bkg_spatial_size)
    # reference build.py:68-119
    "sam2_t": (96, (1, 2, 7, 2), 1, (5, 7, 9), (8, 4, 14, 7),
               (768, 384, 192, 96), (7, 7)),
    "sam2_s": (96, (1, 2, 11, 2), 1, (7, 10, 13), (8, 4, 14, 7),
               (768, 384, 192, 96), (7, 7)),
    "sam2_b": (112, (2, 3, 16, 3), 2, (12, 16, 20), (8, 4, 14, 7),
               (896, 448, 224, 112), (14, 14)),
    "sam2_l": (144, (2, 6, 36, 4), 2, (23, 33, 43), (8, 4, 16, 8),
               (1152, 576, 288, 144), (7, 7)),
}


def build_sam2(variant: str = "sam2_t", img_size: int = 1024, **overrides) -> SAM2Model:
    """Build a SAM2 model by variant name (reference build.py sam_model_map)."""
    key = variant.replace(".pt", "").replace("-", "_").replace("sam2.1", "sam2")
    if key not in SAM2_CONFIGS:
        raise ValueError(f"unknown SAM2 variant '{variant}'; options {sorted(SAM2_CONFIGS)}")
    ed, stages, nh, gab, ws, bcl, wbg = SAM2_CONFIGS[key]
    return SAM2Model(image_size=img_size, embed_dim=ed, stages=stages, num_heads=nh,
                     global_att_blocks=gab, window_spec=ws, backbone_channel_list=bcl,
                     window_pos_embed_bkg_spatial_size=wbg, **overrides)
