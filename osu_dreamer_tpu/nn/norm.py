"""RMS normalization over the channel (last) dimension.

Parity with reference common/rms_norm.py:7-26: fp32 statistics regardless of
compute dtype, eps 1e-6, optional affine gain with configurable init (the
reference uses gain=1e-3 to near-zero residual branches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def rms_norm(x: jnp.ndarray, gamma: jnp.ndarray | None = None) -> jnp.ndarray:
    """normalize channels (last dim) to unit RMS; statistics in fp32"""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    out = (xf * inv).astype(x.dtype)
    if gamma is not None:
        out = out * gamma.astype(x.dtype)
    return out


class RMSNorm(nn.Module):
    dim: int
    affine: bool = True
    gain: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False) -> jnp.ndarray:
        """``params_only=True`` declares and returns the gamma param without
        computing — used by fused layer kernels (ops/film_layer.py) that
        consume the param directly while keeping this module's param path"""
        gamma = None
        if self.affine:
            gamma = self.param(
                "gamma", lambda _key: jnp.full((self.dim,), self.gain, jnp.float32)
            )
        if params_only:
            return gamma
        return rms_norm(x, gamma)
