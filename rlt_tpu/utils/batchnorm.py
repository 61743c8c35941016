"""Feature-channel normalization helper (reference utils/batchnorm.py:4-11 —
an unused utility normalizing each feature channel over the whole dataset).
Vectorized jnp version; also usable inside jit."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Normalize each feature channel of (N, L, F) over all (N, L) positions
    to zero mean / unit variance — the torch BatchNorm1d-in-eval trick the
    reference's helper implements."""
    mean = jnp.mean(x, axis=(0, 1), keepdims=True)
    var = jnp.var(x, axis=(0, 1), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
