"""Pallas fused linear-attention kernel: numerical parity + custom-VJP
gradient correctness (VERDICT r2 #7 — no untested custom-VJP kernel in the
tree). Off-TPU the kernel runs in interpreter mode, so these tests exercise
the same kernel body CI-side that the TPU executes compiled."""

import jax
import jax.numpy as jnp
import numpy as np

from edgeyolo_tpu.ops.pallas.linear_attention import _la_reference, linear_attention


def _rand(shape, seed=0, scale=0.5):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


def test_forward_matches_xla_composition():
    b, n, h, d = 2, 49, 2, 32
    q, k, v = _rand((b, n, h, d), 0), _rand((b, n, h, d), 1), _rand((b, n, h, d), 2)
    y_pal = linear_attention(q, k, v)
    y_ref = _la_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)


def test_vjp_matches_reference_grad():
    b, n, h, d = 1, 25, 2, 16
    q, k, v = _rand((b, n, h, d), 3), _rand((b, n, h, d), 4), _rand((b, n, h, d), 5)

    def loss_pal(q, k, v):
        return jnp.sum(jnp.sin(linear_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_la_reference(q, k, v)))

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_module_use_pallas_equals_xla_path():
    """LinearAttention(use_pallas=True) must equal the default XLA path with
    identical params — the module-level wiring contract."""
    from edgeyolo_tpu.nn.modules.edgeline import LinearAttention

    x = _rand((2, 8, 8, 64), 6)
    m_x = LinearAttention(64, 2, use_pallas=False)
    m_p = LinearAttention(64, 2, use_pallas=True)
    v = m_x.init(jax.random.PRNGKey(0), x)
    y_x = m_x.apply(v, x)
    y_p = m_p.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-5)
