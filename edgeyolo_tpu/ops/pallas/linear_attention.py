"""Fused Pallas TPU kernel for EdgeLine linear attention.

The op (reference behavior, ultralytics/nn/modules/block.py:3348-3373):
    k' = softmax(k, axis=head_dim); q' = softmax(q, axis=tokens)
    context = k'^T v        (d x d)
    y = q' @ context        O(N d^2)

One (batch, head) pair per grid step; q/k/v tiles live in VMEM, the two
softmaxes run on the VPU and the two contractions hit the MXU with fp32
accumulation — zero HBM round-trips between the five stages. Falls back to
interpreter mode off-TPU, and training uses a custom VJP whose backward is
the (fused-by-XLA) composition's own gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _la_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # softmax over head_dim (rows of k)
    k = jax.nn.softmax(k, axis=-1)
    # softmax over tokens (columns of q)
    qm = jnp.max(q, axis=0, keepdims=True)
    qe = jnp.exp(q - qm)
    q = qe / (jnp.sum(qe, axis=0, keepdims=True) + 1e-9)
    context = jax.lax.dot_general(
        k, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, D)
    y = jnp.dot(q, context, preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _la_pallas(q, k, v, interpret: bool):
    """q/k/v: (BH, N, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        _la_kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * (n * d * d * 2),
            bytes_accessed=4 * bh * n * d * 4,
            transcendentals=2 * bh * n * d,
        ),
    )(q, k, v)


def _la_reference(q, k, v):
    """Pure-XLA composition (also the VJP path). q/k/v: (B, N, H, D)."""
    k = jax.nn.softmax(k, axis=-1)
    q = jax.nn.softmax(q, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    return jnp.einsum("bnhd,bhde->bnhe", q, context)


@jax.custom_vjp
def linear_attention(q, k, v):
    """Fused linear attention. q/k/v: (B, N, heads, head_dim)."""
    b, n, h, d = q.shape
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    y = _la_pallas(qt, kt, vt, interpret=not on_tpu)
    return y.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _la_fwd(q, k, v):
    return linear_attention(q, k, v), (q, k, v)


def _la_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_la_reference, q, k, v)
    return vjp(g)


linear_attention.defvjp(_la_fwd, _la_bwd)
