"""Weights-ready CLIP text tower (nn/clip_text.py): architecture shape/norm,
converter key-mapping round-trip against a synthetic torch-keyed dump, BPE
tokenizer algorithm on a synthetic merges file, and the WorldModel string
gate. Real ViT-B/32 weights are absent from this image (like NAS), so parity
is proven structurally: every torch key consumed, packed qkv split, causal
mask + EOT pooling semantics asserted."""

import gzip

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgeyolo_tpu.nn import clip_text as C


def test_text_model_shapes_and_norm():
    m = C.ClipTextModel()
    toks = np.zeros((2, C.CONTEXT), np.int32)
    toks[:, 0] = C.VOCAB - 2  # sot
    toks[0, 1], toks[1, 1] = 10, 20
    toks[:, 2] = C.VOCAB - 1  # eot
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    out = m.apply(v, jnp.asarray(toks))
    assert out.shape == (2, C.WIDTH)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)
    # different tokens -> different embeddings
    assert float(jnp.abs(out[0] - out[1]).max()) > 1e-4


def test_causal_mask_and_eot_pooling():
    """Tokens AFTER the EOT position must not affect the embedding (causal
    attention + EOT pooling — the CLIP contract)."""
    m = C.ClipTextModel()
    toks = np.zeros((1, C.CONTEXT), np.int32)
    toks[0, 0], toks[0, 1], toks[0, 2] = C.VOCAB - 2, 7, C.VOCAB - 1
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    out1 = m.apply(v, jnp.asarray(toks))
    toks2 = toks.copy()
    toks2[0, 10:20] = 123  # garbage after EOT
    out2 = m.apply(v, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_converter_roundtrip_synthetic_dump():
    """A synthetic torch-keyed state dict loads; a known weight change must
    change the output (proving the key actually landed)."""
    rng = np.random.RandomState(0)
    sd = {
        "token_embedding.weight": rng.randn(C.VOCAB, C.WIDTH).astype(np.float32) * 0.02,
        "positional_embedding": rng.randn(C.CONTEXT, C.WIDTH).astype(np.float32) * 0.01,
        "text_projection": rng.randn(C.WIDTH, C.WIDTH).astype(np.float32) * 0.02,
        "ln_final.weight": np.ones(C.WIDTH, np.float32),
        "ln_final.bias": np.zeros(C.WIDTH, np.float32),
    }
    for i in range(C.LAYERS):
        p = f"transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = np.ones(C.WIDTH, np.float32)
        sd[p + "ln_1.bias"] = np.zeros(C.WIDTH, np.float32)
        sd[p + "ln_2.weight"] = np.ones(C.WIDTH, np.float32)
        sd[p + "ln_2.bias"] = np.zeros(C.WIDTH, np.float32)
        sd[p + "attn.in_proj_weight"] = rng.randn(3 * C.WIDTH, C.WIDTH).astype(np.float32) * 0.02
        sd[p + "attn.in_proj_bias"] = np.zeros(3 * C.WIDTH, np.float32)
        sd[p + "attn.out_proj.weight"] = rng.randn(C.WIDTH, C.WIDTH).astype(np.float32) * 0.02
        sd[p + "attn.out_proj.bias"] = np.zeros(C.WIDTH, np.float32)
        sd[p + "mlp.c_fc.weight"] = rng.randn(4 * C.WIDTH, C.WIDTH).astype(np.float32) * 0.02
        sd[p + "mlp.c_fc.bias"] = np.zeros(4 * C.WIDTH, np.float32)
        sd[p + "mlp.c_proj.weight"] = rng.randn(C.WIDTH, 4 * C.WIDTH).astype(np.float32) * 0.02
        sd[p + "mlp.c_proj.bias"] = np.zeros(C.WIDTH, np.float32)

    m = C.ClipTextModel()
    toks = np.zeros((1, C.CONTEXT), np.int32)
    toks[0, :3] = [C.VOCAB - 2, 5, C.VOCAB - 1]
    v0 = m.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    v1 = C.convert_clip_text_state_dict(sd, jax.tree.map(np.asarray, v0))
    out1 = m.apply(v1, jnp.asarray(toks))
    sd2 = dict(sd)
    sd2["token_embedding.weight"] = sd["token_embedding.weight"] * 2.0
    v2 = C.convert_clip_text_state_dict(sd2, jax.tree.map(np.asarray, v0))
    out2 = m.apply(v2, jnp.asarray(toks))
    assert float(jnp.abs(out1 - out2).max()) > 1e-4


def test_bpe_tokenizer_on_synthetic_merges(tmp_path):
    """BPE algorithm sanity on a tiny synthetic merges file: merge 'lo' then
    'low</w>' and check ids + sot/eot framing."""
    merges = "#version\nl o\nlo w</w>\n"
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write(merges + "\n".join("x y" for _ in range(10)))
    tok = C.ClipBPETokenizer(path)
    ids = tok.tokenize(["low low"])
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    assert ids[0, 0] == sot
    low_id = tok.encoder["low</w>"]
    assert list(ids[0, 1:3]) == [low_id, low_id]
    assert ids[0, 3] == eot


def test_world_string_gate_raises_without_weights():
    from edgeyolo_tpu.nn.tasks import WorldModel

    m = WorldModel.__new__(WorldModel)  # no net build needed for the gate
    with pytest.raises(ValueError, match="clip_npz"):
        WorldModel.set_classes(m, ["person", "car"])
