"""Segment Anything (SAM) — promptable segmentation, flax/NHWC.

Behavioral spec: reference ultralytics/models/sam/modules/ —
ImageEncoderViT (encoders.py: patch embed 16x16, windowed ViT blocks with
decomposed relative positions, global-attention blocks at fixed indices,
neck 1x1+3x3 conv to 256ch), PromptEncoder (prompt_encoder.py: random
Fourier positional embedding, point/box labels as learned embeddings, mask
downscaling stem), TwoWayTransformer + MaskDecoder (decoders.py: iou token +
4 mask tokens, hypernetwork MLPs over upscaled embeddings), and
build_sam_vit_{b,l,h} (build.py:23-) — re-designed channels-last so every
matmul tiles onto the MXU; attention is plain batched einsum (XLA fuses the
QKV projections), windows are static reshapes.

Weights: random-init by default; reference SAM .pt checkpoints convert via
utils/torch_convert.py when naming is mirrored (round-2 work).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

KINIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


# --------------------------------------------------------------------------
# image encoder
# --------------------------------------------------------------------------
class _Attention(nn.Module):
    """ViT attention with optional decomposed relative position bias."""

    dim: int
    num_heads: int
    use_rel_pos: bool
    input_size: tuple[int, int]

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, kernel_init=KINIT, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, nh, HW, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(hd)
        if self.use_rel_pos:
            rh = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd))
            rw = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd))
            attn = attn + _decomposed_rel_pos(q, rh, rw, (H, W))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return nn.Dense(C, kernel_init=KINIT, name="proj")(out)


def _rel_coords(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select interpolation-free relative position table rows (q==k here)."""
    coords = jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :] + (k_size - 1)
    return rel_pos[coords]  # (q, k, hd)


def _decomposed_rel_pos(q, rel_h, rel_w, hw):
    """MViT-style decomposed relative position bias (reference encoders.py)."""
    H, W = hw
    B, nh, _, hd = q.shape
    Rh = _rel_coords(H, H, rel_h)  # (H, H, hd)
    Rw = _rel_coords(W, W, rel_w)  # (W, W, hd)
    r_q = q.reshape(B, nh, H, W, hd)
    bias_h = jnp.einsum("bnhwd,hkd->bnhwk", r_q, Rh)  # (B,nh,H,W,H)
    bias_w = jnp.einsum("bnhwd,wkd->bnhwk", r_q, Rw)  # (B,nh,H,W,W)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,nh,H,W,H,W)
    return bias.reshape(B, nh, H * W, H * W)


class _Block(nn.Module):
    """ViT block: (windowed) attention + MLP, pre-norm."""

    dim: int
    num_heads: int
    window: int  # 0 = global attention
    input_size: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.LayerNorm(name="norm1")(x)
        if self.window > 0:
            w = self.window
            ph, pw = (-H) % w, (-W) % w
            hp = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            hw = hp.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
            hw = hw.reshape(-1, w, w, C)
            hw = _Attention(self.dim, self.num_heads, True, (w, w), name="attn")(hw)
            hw = hw.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
            h = hw.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            h = _Attention(self.dim, self.num_heads, True, self.input_size, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(4 * C, kernel_init=KINIT, name="mlp_lin1")(h)
        h = nn.Dense(C, kernel_init=KINIT, name="mlp_lin2")(jax.nn.gelu(h, approximate=False))
        return x + h


class ImageEncoderViT(nn.Module):
    """SAM's ViT image encoder -> (B, H/16, W/16, 256) embedding."""

    img_size: int = 1024
    patch: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_idx: Sequence[int] = (2, 5, 8, 11)
    window: int = 14
    out_chans: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.img_size // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    padding="VALID", kernel_init=KINIT, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, self.dim))
        x = x + pos[:, : x.shape[1], : x.shape[2]]
        for i in range(self.depth):
            win = 0 if i in self.global_idx else self.window
            x = _Block(self.dim, self.num_heads, win, (x.shape[1], x.shape[2]),
                       name=f"block_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, kernel_init=KINIT, name="neck_0")(x)
        x = nn.LayerNorm(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=KINIT, name="neck_2")(x)
        return nn.LayerNorm(name="neck_3")(x)


# --------------------------------------------------------------------------
# prompt encoder
# --------------------------------------------------------------------------
class PromptEncoder(nn.Module):
    """Points/boxes/masks -> sparse and dense prompt embeddings.

    Point labels: 1 foreground, 0 background, 2/3 box corners, -1 pad.
    """

    embed_dim: int = 256
    grid: int = 64  # image embedding spatial size

    @staticmethod
    def _pe(mat, coords01):
        """Random Fourier features positional encoding (reference
        prompt_encoder.py PositionEmbeddingRandom)."""
        c = 2 * jnp.pi * ((2.0 * coords01 - 1.0) @ mat)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    @nn.compact
    def __call__(self, points, labels, masks=None):
        """points (B, N, 2) in [0,1]; labels (B, N) int; masks optional
        (B, 4*grid, 4*grid, 1). Returns (sparse (B,N,E), dense (B,g,g,E),
        dense_pe (g,g,E))."""
        E = self.embed_dim
        mat = self.param("pe_gaussian", nn.initializers.normal(1.0), (2, E // 2))
        emb = self.param("point_embeddings", nn.initializers.normal(1.0), (4, E))
        not_a_point = self.param("not_a_point_embed", nn.initializers.normal(1.0), (E,))

        pe = self._pe(mat, points)
        lab = labels[..., None]
        sparse = jnp.where(lab == -1, not_a_point[None, None], pe)
        for li in range(4):
            sparse = jnp.where(lab == li, pe + emb[li][None, None], sparse)

        if masks is not None:
            # reference mask_downscaling widths: mask_in_chans=16 -> 4, 16, E
            # (prompt_encoder.py; NOT E-relative)
            m = nn.Conv(4, (2, 2), strides=(2, 2), kernel_init=KINIT, name="mask_down_0")(masks)
            m = jax.nn.gelu(nn.LayerNorm(name="mask_down_ln0")(m), approximate=False)
            m = nn.Conv(16, (2, 2), strides=(2, 2), kernel_init=KINIT, name="mask_down_1")(m)
            m = jax.nn.gelu(nn.LayerNorm(name="mask_down_ln1")(m), approximate=False)
            dense = nn.Conv(E, (1, 1), kernel_init=KINIT, name="mask_down_2")(m)
        else:
            no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0), (E,))
            dense = jnp.broadcast_to(no_mask[None, None, None],
                                     (points.shape[0], self.grid, self.grid, E))
        # dense positional encoding over the embedding grid
        ys = (jnp.arange(self.grid, dtype=jnp.float32) + 0.5) / self.grid
        gy, gx = jnp.meshgrid(ys, ys, indexing="ij")
        dense_pe = self._pe(mat, jnp.stack([gx, gy], -1))
        return sparse, dense, dense_pe


# --------------------------------------------------------------------------
# two-way transformer mask decoder
# --------------------------------------------------------------------------
class _XAttn(nn.Module):
    dim: int
    heads: int
    down: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.down
        hd = d // self.heads
        qp = nn.Dense(d, kernel_init=KINIT, name="q")(q)
        kp = nn.Dense(d, kernel_init=KINIT, name="k")(k)
        vp = nn.Dense(d, kernel_init=KINIT, name="v")(v)
        B, N, _ = qp.shape
        M = kp.shape[1]
        qp = qp.reshape(B, N, self.heads, hd)
        kp = kp.reshape(B, M, self.heads, hd)
        vp = vp.reshape(B, M, self.heads, hd)
        a = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", qp, kp) / math.sqrt(hd), -1)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, vp).reshape(B, N, d)
        return nn.Dense(self.dim, kernel_init=KINIT, name="out")(o)


class _TwoWayBlock(nn.Module):
    dim: int
    heads: int
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        # reference transformer.py:235-241: layer 0 self-attn REPLACES queries
        if self.skip_first_pe:
            queries = _XAttn(self.dim, self.heads, name="self_attn")(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + _XAttn(self.dim, self.heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)
        q = queries + qpe
        k = keys + kpe
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            queries + _XAttn(self.dim, self.heads, 2, name="cross_t2i")(q, k, keys))
        h = nn.Dense(2048, kernel_init=KINIT, name="mlp_lin1")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + nn.Dense(self.dim, kernel_init=KINIT, name="mlp_lin2")(jax.nn.relu(h)))
        q = queries + qpe
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(
            keys + _XAttn(self.dim, self.heads, 2, name="cross_i2t")(k, q, queries))
        return queries, keys


class MaskDecoder(nn.Module):
    """IoU token + mask tokens through a two-way transformer, hypernetwork
    MLPs over 4x-upscaled embeddings (reference decoders.py:12-180)."""

    dim: int = 256
    heads: int = 8
    depth: int = 2
    num_masks: int = 4  # 1 whole + 3 multimask

    @nn.compact
    def __call__(self, img_embed, dense_pe, sparse, dense):
        B = sparse.shape[0]
        E = self.dim
        iou_tok = self.param("iou_token", nn.initializers.normal(1.0), (1, E))
        mask_tok = self.param("mask_tokens", nn.initializers.normal(1.0), (self.num_masks, E))
        toks = jnp.concatenate([iou_tok, mask_tok], 0)[None]
        toks = jnp.broadcast_to(toks, (B, toks.shape[1], E))
        queries = jnp.concatenate([toks, sparse], axis=1)

        g = img_embed.shape[1]
        keys = (img_embed + dense).reshape(B, g * g, E)
        kpe = jnp.broadcast_to(dense_pe.reshape(1, g * g, E), (B, g * g, E))
        qpe = queries  # token embeddings double as their own PE (ref semantics)
        for i in range(self.depth):
            queries, keys = _TwoWayBlock(E, self.heads, skip_first_pe=(i == 0),
                                         name=f"layer_{i}")(queries, keys, qpe, kpe)
        q = queries + qpe
        k = keys + kpe
        queries = nn.LayerNorm(epsilon=1e-5, name="final_norm")(
            queries + _XAttn(E, self.heads, 2, name="final_attn")(q, k, keys))

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + self.num_masks]

        src = keys.reshape(B, g, g, E)
        up = nn.ConvTranspose(E // 4, (2, 2), strides=(2, 2), kernel_init=KINIT, name="upscale_0")(src)
        up = jax.nn.gelu(nn.LayerNorm(name="upscale_ln")(up), approximate=False)
        up = jax.nn.gelu(nn.ConvTranspose(E // 8, (2, 2), strides=(2, 2), kernel_init=KINIT, name="upscale_1")(up), approximate=False)

        hyper = []
        for i in range(self.num_masks):
            h = mask_out[:, i]
            for li in range(2):
                h = jax.nn.relu(nn.Dense(E, kernel_init=KINIT, name=f"hyper_{i}_l{li}")(h))
            hyper.append(nn.Dense(E // 8, kernel_init=KINIT, name=f"hyper_{i}_l2")(h))
        hyper = jnp.stack(hyper, 1)  # (B, num_masks, E//8)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)

        h = iou_out
        for li in range(2):
            h = jax.nn.relu(nn.Dense(E, kernel_init=KINIT, name=f"iou_l{li}")(h))
        iou_pred = nn.Dense(self.num_masks, kernel_init=KINIT, name="iou_l2")(h)
        return masks, iou_pred


class SAMModel(nn.Module):
    """Full promptable pipeline: encode once, prompt many times."""

    img_size: int = 1024
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_idx: Sequence[int] = (2, 5, 8, 11)
    mobile: bool = False  # MobileSAM: TinyViT encoder (reference build.py:56)

    def setup(self):
        if self.mobile:
            from edgeyolo_tpu.nn.tinyvit import TinyViT

            self.image_encoder = TinyViT()
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, dim=self.encoder_dim, depth=self.encoder_depth,
                num_heads=self.encoder_heads, global_idx=self.global_idx)
        self.prompt_encoder = PromptEncoder(grid=self.img_size // 16)
        self.mask_decoder = MaskDecoder()

    def encode(self, x):
        return self.image_encoder(x)

    def prompt(self, img_embed, points, labels, masks=None):
        sparse, dense, dense_pe = self.prompt_encoder(points, labels, masks)
        return self.mask_decoder(img_embed, dense_pe, sparse, dense)

    def __call__(self, x, points, labels):
        return self.prompt(self.encode(x), points, labels)


_VARIANTS = {
    # dim, depth, heads, global attention indices (reference build.py:23-107)
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}


def build_sam(variant: str = "vit_b", img_size: int = 1024) -> SAMModel:
    """Construct a SAM model by encoder variant (reference sam_model_map)."""
    if variant.startswith("sam2"):
        raise ValueError("SAM2 lives in nn/sam2.py — use build_sam2()/engine.sam2.SAM2")
    if variant in {"mobile_sam", "mobile"}:
        return SAMModel(img_size=img_size, mobile=True)
    dim, depth, heads, gidx = _VARIANTS[variant]
    return SAMModel(img_size=img_size, encoder_dim=dim, encoder_depth=depth,
                    encoder_heads=heads, global_idx=gidx)
