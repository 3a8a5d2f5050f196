"""Shared elementwise ops (utils/ops.py equivalents)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leakyrelu(x: jnp.ndarray, alpha: float = 0.3) -> jnp.ndarray:
    """max(x, alpha*x) with the reference's alpha=0.3 (utils/ops.py:120)."""
    return jnp.maximum(x, alpha * x)


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Per-feature parametric ReLU (utils/ops.py:123-136)."""
    pos = jax.nn.relu(x)
    neg = alpha * (x - jnp.abs(x)) * 0.5
    return pos + neg


def gaussian_noise(key: jax.Array, x: jnp.ndarray,
                   std) -> jnp.ndarray:
    """Additive input noise layer (utils/ops.py:19-30). ``std`` may be a
    traced scalar (the annealed disc_noise_std variable)."""
    return x + std * jax.random.normal(key, x.shape, dtype=x.dtype)
