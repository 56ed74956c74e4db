"""Activation modules: AGLU (Unified activation) and TeLU.

Behavioral spec: reference nn/modules/activation.py:9-70 — AGLU computes
exp((1/lambda) * softplus_{beta=-1}(kappa*x - log lambda)) with learnable
lambda/kappa (uniform(0,1) init, lambda clamped >= 1e-4); TeLU is
x * tanh(exp(x)) with a numerically stable large-positive cutoff (the
reference wraps a custom autograd Function for the stable branch — JAX
differentiates the jnp.where formulation to the same gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def telu(x, cutoff: float = 20.0):
    """TeLU activation: x * tanh(exp(x)); y ~= x for x > cutoff."""
    safe = jnp.minimum(x, cutoff)
    return jnp.where(x > cutoff, x, x * jnp.tanh(jnp.exp(safe)))


class TeLU(nn.Module):
    """Module wrapper over telu() (reference activation.py:70+)."""

    cutoff: float = 20.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return telu(x, self.cutoff)


class AGLU(nn.Module):
    """Unified activation (https://github.com/kostas1515/AGLU;
    reference activation.py:9-23)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        lambd = self.param("lambd", nn.initializers.uniform(scale=1.0), (1,))
        kappa = self.param("kappa", nn.initializers.uniform(scale=1.0), (1,))
        lam = jnp.clip(lambd, 1e-4)
        # softplus with beta=-1: (1/-1) * log(1 + exp(-(kx - log lam)))
        z = kappa * x - jnp.log(lam)
        sp = -jnp.logaddexp(0.0, -z)  # = -log(1 + exp(-z)), stable
        return jnp.exp(sp / lam)
