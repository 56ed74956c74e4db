"""Shape/behavior smoke tests for the layer zoo (NHWC), mirroring the
reference's direct nn-module instantiation tests (tests/test_python.py:471-504)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import edgeyolo_tpu.nn.modules as M

RNG = jax.random.PRNGKey(0)
X32 = jnp.ones((2, 16, 16, 32))


def _run(mod, x=X32, train=False):
    v = mod.init(RNG, x, train=True)
    if train:
        return mod.apply(v, x, train=True, mutable=["batch_stats"])[0]
    return mod.apply(v, x, train=False)


@pytest.mark.parametrize(
    "mod,cout",
    [
        (M.Conv(16, 3, 1), 16),
        (M.Conv(16, 3, 2), 16),
        (M.DWConv(32, 3), 32),
        (M.DSConv(16, 3), 16),
        (M.GhostConv(16), 16),
        (M.Focus(16, 3), 16),
        (M.Bottleneck(32), 32),
        (M.C2f(32, 2), 32),
        (M.C3(32, 1), 32),
        (M.C3k2(64, 1, c3k=True), 64),
        (M.C3k2(64, 1, c3k=False), 64),
        (M.SPPF(32), 32),
        (M.SPP(32), 32),
        (M.SCDown(64, 3, 2), 64),
        (M.C2PSA(32, 1, 0.5), 32),
        (M.PSA(32), 32),
        (M.C2PSA_LinearAttention(32, 1), 32),
        (M.DSC3K2(32, 1, dsc3k=True), 32),
        (M.DSC3K2(32, 1, dsc3k=False), 32),
        (M.DSC3K2_Wavelet(32, 1), 32),
        (M.C3k2_Wavelet(32, 1), 32),
        (M.SPPF_Wavelet(32), 32),
        (M.MulGate(32), 32),
        (M.RHJM(32), 32),
    ],
)
def test_block_shapes(mod, cout):
    y = _run(mod)
    assert y.shape[-1] == cout
    assert y.shape[0] == 2
    assert bool(jnp.all(jnp.isfinite(y)))


def test_stride2_halves_spatial():
    y = _run(M.Conv(16, 3, 2))
    assert y.shape[1:3] == (8, 8)


def test_dwt_orthonormal_energy():
    """Haar DWT preserves energy (orthonormal filter bank)."""
    x = jax.random.normal(RNG, (1, 16, 16, 4))
    mod = M.DWT2D("haar")
    v = mod.init(RNG, x)
    ll, lh, hl, hh = mod.apply(v, x)
    e_in = jnp.sum(x**2)
    e_out = sum(jnp.sum(s**2) for s in (ll, lh, hl, hh))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-3)  # fp32 accumulation noise


def test_dwt_constant_image_high_bands_zero():
    x = jnp.ones((1, 8, 8, 2)) * 3.0
    mod = M.DWT2D("haar")
    v = mod.init(RNG, x)
    ll, lh, hl, hh = mod.apply(v, x)
    np.testing.assert_allclose(ll, 6.0, atol=1e-6)  # 3 * 2 (sqrt2*sqrt2 gain)
    for s in (lh, hl, hh):
        np.testing.assert_allclose(s, 0.0, atol=1e-6)


def test_linear_attention_matches_naive():
    """LinearAttention == softmax-normalized kv contraction, by construction."""
    dim, heads = 32, 2
    x = jax.random.normal(RNG, (1, 4, 4, dim))
    mod = M.LinearAttention(dim, heads)
    v = mod.init(RNG, x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_wavelet_enhancer_residual_starts_identity():
    """gamma init 0 => tanh(gamma)=0 => enhancer is the identity at init."""
    x = jax.random.normal(RNG, (1, 8, 8, 16))
    mod = M.WaveletEnhancer(16)
    v = mod.init(RNG, x, train=False)
    y = mod.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_dfl_decode_uniform_gives_midpoint():
    logits = jnp.zeros((2, 5, 64))
    d = M.dfl_decode(logits, 16)
    np.testing.assert_allclose(np.asarray(d), 7.5, atol=1e-5)


def test_detect_head_shapes():
    feats = [jnp.ones((2, 8, 8, 64)), jnp.ones((2, 4, 4, 128)), jnp.ones((2, 2, 2, 256))]
    head = M.Detect(nc=80, ch=(64, 128, 256), stride=(8, 16, 32))
    v = head.init(RNG, feats, train=True)
    out = head.apply(v, feats, train=False)
    assert out["pred"].shape == (2, 8 * 8 + 4 * 4 + 2 * 2, 84)
    tr = head.apply(v, feats, train=True, mutable=["batch_stats"])[0]
    assert len(tr["feats"]) == 3 and tr["feats"][0].shape == (2, 8, 8, 144)


def test_gf2_head_quality_in_range():
    feats = [jnp.ones((1, 8, 8, 64)), jnp.ones((1, 4, 4, 128)), jnp.ones((1, 2, 2, 256))]
    head = M.GF2Detect(nc=3, ch=(64, 128, 256), stride=(8, 16, 32))
    v = head.init(RNG, feats, train=True)
    out = head.apply(v, feats, train=False)
    for q in out["quality"]:
        assert bool(jnp.all((q >= 0) & (q <= 1)))
    assert out["pred"].shape[-1] == 4 + 3


def test_intent_modules_shapes():
    """Intended-behavior rebuilds of the reference's broken families
    (MSLA/LGL/wavelet-mixer — non-instantiable in the reference snapshot,
    SURVEY.md §2.3)."""
    import edgeyolo_tpu.nn.modules as M2

    x = jnp.ones((1, 16, 16, 32))
    for mod in (M2.MSLA(32, 2), M2.DSC3K2_MSLA(32, 1), M2.DSC3K2_LGL(32, 1),
                M2.C3AW_MLM(32), M2.LocalSS2DContext(32)):
        v = mod.init(RNG, x, train=True)
        y = mod.apply(v, x, train=False)
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
    xs = [jnp.ones((1, 16, 16, 32)), jnp.ones((1, 8, 8, 32)), jnp.ones((1, 4, 4, 32))]
    hw = M2.HyperACE_Wavelet(64)
    v = hw.init(RNG, xs, train=True)
    assert hw.apply(v, xs, train=False).shape == (1, 8, 8, 64)


def test_world_blocks_shapes():
    import numpy as np
    import edgeyolo_tpu.nn.modules as M2

    x = jnp.ones((2, 8, 8, 32))
    text = jnp.asarray(np.random.RandomState(0).randn(2, 5, 512), jnp.float32)
    attn = M2.C2fAttn(32, 1, ec=64, nh=2)
    v = attn.init(RNG, x, text, train=True)
    assert attn.apply(v, x, text, train=False).shape == (2, 8, 8, 32)
    head = M2.WorldDetect(nc=5, ch=(32, 64, 128), stride=(8, 16, 32))
    feats = [jnp.ones((2, 8, 8, 32)), jnp.ones((2, 4, 4, 64)), jnp.ones((2, 2, 2, 128))]
    v = head.init(RNG, feats, train=True, text=text)
    out = head.apply(v, feats, train=False, text=text)
    assert out["pred"].shape == (2, 84, 9)
