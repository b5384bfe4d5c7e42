"""Random Fourier features.

Parity with reference common/fourier_features.py:8-17: fixed (untrained)
``W ~ N(0, n_bins^2)``, phase ``b ~ U(-pi, pi)``, output
``sqrt(2/F) * cos(x W^T + b)``. Instead of carrying buffers in the parameter
tree, the random tables are regenerated from a fixed PRNG key at trace time —
stateless, deterministic across calls/checkpoints, and fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RFF_SEED = 0x05EED


def fourier_features(
    x: jnp.ndarray, features: int, n_bins: int = 16
) -> jnp.ndarray:
    """(..., I) -> (..., features) random Fourier embedding"""
    in_dim = x.shape[-1]
    kw, kb = jax.random.split(jax.random.PRNGKey(_RFF_SEED))
    W = jax.random.normal(kw, (in_dim, features), jnp.float32) * float(n_bins)
    b = jax.random.uniform(kb, (features,), jnp.float32, -jnp.pi, jnp.pi)
    scale = (2.0 / features) ** 0.5
    return (scale * jnp.cos(x.astype(jnp.float32) @ W + b)).astype(x.dtype)
