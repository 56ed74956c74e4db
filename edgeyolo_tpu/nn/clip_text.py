"""CLIP ViT-B/32 text tower, weights-ready (flax, TPU-native).

The reference's WorldModel.set_classes encodes class-name strings through
OpenAI CLIP's text transformer (reference nn/tasks.py:633-652: clip.load
("ViT-B/32") + clip.tokenize + encode_text + L2-normalize). Neither the clip
package nor its weights ship in this image, so — like the NAS family — this
module is *weights-ready*: the full architecture + tokenizer + converter are
implemented and tested at random init; point `load_clip_text` at a real
ViT-B/32 state dict (.npz of torch keys) and `ClipBPETokenizer` at the
public `bpe_simple_vocab_16e6.txt.gz` to get reference-equal embeddings.

Architecture (OpenAI CLIP ViT-B/32 text encoder):
  token_embedding(49408, 512) + positional(77, 512)
  -> 12 x pre-LN transformer blocks (8 heads, causal mask, QuickGELU MLP 4x)
  -> final LN -> features at the EOT token -> text_projection (512 -> 512)
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CONTEXT = 77
VOCAB = 49408
WIDTH = 512
HEADS = 8
LAYERS = 12


# ---------------------------------------------------------------------------
# BPE tokenizer (OpenAI CLIP simple tokenizer; public algorithm)
# ---------------------------------------------------------------------------
@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class ClipBPETokenizer:
    """CLIP's byte-level BPE. Needs the public merges file
    (bpe_simple_vocab_16e6.txt.gz — not in this image; pass a path)."""

    def __init__(self, bpe_path: str | Path):
        import regex as re

        self.re = re
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        # clip does ftfy.fix_text + html.unescape; ftfy is absent here, the
        # html unescape + whitespace collapse covers ASCII class names
        text = html.unescape(html.unescape(text))
        text = " ".join(text.split()).strip().lower()
        ids = []
        for token in self.re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def tokenize(self, texts: list[str], context: int = CONTEXT) -> np.ndarray:
        sot, eot = self.encoder["<|startoftext|>"], self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), context), np.int32)
        for i, t in enumerate(texts):
            ids = [sot] + self.encode(t)[: context - 2] + [eot]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------
def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Block(nn.Module):
    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h = nn.SelfAttention(num_heads=HEADS, qkv_features=WIDTH, use_bias=True,
                             name="attn")(h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(WIDTH * 4, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(WIDTH, name="mlp_proj")(h)
        return x + h


class ClipTextModel(nn.Module):
    """CLIP text encoder; __call__(tokens (B, 77) int32) -> (B, 512) L2-normed."""

    @nn.compact
    def __call__(self, tokens):
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (VOCAB, WIDTH))
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (CONTEXT, WIDTH))
        x = tok[tokens] + pos[None]
        causal = jnp.tril(jnp.ones((CONTEXT, CONTEXT), bool))[None, None]
        for i in range(LAYERS):
            x = _Block(name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # features at the EOT token (highest id in each row)
        eot = jnp.argmax(tokens, axis=-1)
        feats = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection", nn.initializers.normal(WIDTH**-0.5),
                          (WIDTH, WIDTH))
        feats = feats @ proj
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)


def convert_clip_text_state_dict(sd: dict, variables: dict) -> dict:
    """Map OpenAI CLIP torch keys (text tower subset) onto ClipTextModel
    params. Accepts either `transformer.resblocks.N...` (clip) or the bare
    names from a text-only dump. Packed qkv (in_proj_weight) is split."""
    p = jax.tree.map(np.asarray, dict(variables["params"]))

    def put(dst, path, val):
        d = dst
        for k in path[:-1]:
            d = d[k]
        assert d[path[-1]].shape == val.shape, (path, d[path[-1]].shape, val.shape)
        d[path[-1]] = val

    def g(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32)
        raise KeyError(names)

    put(p, ("token_embedding",), g("token_embedding.weight", "token_embedding"))
    put(p, ("positional_embedding",), g("positional_embedding"))
    put(p, ("text_projection",), g("text_projection"))
    put(p, ("ln_final", "scale"), g("ln_final.weight"))
    put(p, ("ln_final", "bias"), g("ln_final.bias"))
    hd = WIDTH // HEADS
    for i in range(LAYERS):
        pre = f"transformer.resblocks.{i}."
        blk = p[f"resblock_{i}"]
        for ln, tn in (("ln_1", "ln_1"), ("ln_2", "ln_2")):
            blk[ln]["scale"] = g(pre + tn + ".weight")
            blk[ln]["bias"] = g(pre + tn + ".bias")
        w = g(pre + "attn.in_proj_weight")  # (3W, W)
        b = g(pre + "attn.in_proj_bias")
        for j, name in enumerate(("query", "key", "value")):
            blk["attn"][name]["kernel"] = w[j * WIDTH:(j + 1) * WIDTH].T.reshape(WIDTH, HEADS, hd)
            blk["attn"][name]["bias"] = b[j * WIDTH:(j + 1) * WIDTH].reshape(HEADS, hd)
        blk["attn"]["out"]["kernel"] = g(pre + "attn.out_proj.weight").T.reshape(HEADS, hd, WIDTH)
        blk["attn"]["out"]["bias"] = g(pre + "attn.out_proj.bias")
        blk["mlp_fc"]["kernel"] = g(pre + "mlp.c_fc.weight").T
        blk["mlp_fc"]["bias"] = g(pre + "mlp.c_fc.bias")
        blk["mlp_proj"]["kernel"] = g(pre + "mlp.c_proj.weight").T
        blk["mlp_proj"]["bias"] = g(pre + "mlp.c_proj.bias")
    return {"params": p}


def load_clip_text(npz_path: str | Path):
    """(model, variables) from a torch-keyed npz of the ViT-B/32 text tower."""
    m = ClipTextModel()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, CONTEXT), jnp.int32))
    sd = dict(np.load(npz_path))
    return m, convert_clip_text_state_dict(sd, jax.tree.map(np.asarray, v))
