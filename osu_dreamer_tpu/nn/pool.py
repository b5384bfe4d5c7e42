"""Attention pooling: sequence -> single vector.

Parity with reference models/latent/model.py:24-36 (AttnPool): per-head
softmax scores over the sequence, score-weighted value sum, flattened heads
projected to the output dim.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class AttnPool(nn.Module):
    out_dim: int
    head_dim: int
    n_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L, C) -> (B, out_dim)"""
        B, L, _ = x.shape
        scores = nn.Dense(self.n_heads, dtype=self.dtype, name="scores")(x)  # (B, L, H)
        weights = nn.softmax(scores.astype(jnp.float32), axis=1).astype(x.dtype)
        values = nn.Dense(self.n_heads * self.head_dim, dtype=self.dtype, name="values")(x)
        values = values.reshape(B, L, self.n_heads, self.head_dim)
        pooled = jnp.einsum("blh,blhd->bhd", weights, values).reshape(B, -1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(pooled)
