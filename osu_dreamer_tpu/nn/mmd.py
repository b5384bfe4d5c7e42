"""WAE-MMD regularizer: unbiased MMD^2 with inverse-multiquadratic kernels.

Parity with reference common/wae.py:4-28 (Tolstikhin et al. 2018 WAE-MMD):
pulls the aggregate posterior of the style code towards N(0, I) without
per-sample KL/reparameterization; 7 IMQ kernel scales with C = 2d * s.
"""

from __future__ import annotations

import jax.numpy as jnp

_SCALES = (0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0)


def _imq_kernel_sum(sq_dists: jnp.ndarray, c_base: float) -> jnp.ndarray:
    out = jnp.zeros_like(sq_dists)
    for s in _SCALES:
        c = c_base * s
        out = out + c / (c + sq_dists)
    return out


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    return jnp.maximum(aa[:, None] + bb[None, :] - 2.0 * a @ b.T, 0.0)


def mmd_imq(z: jnp.ndarray, z_prior: jnp.ndarray) -> jnp.ndarray:
    """unbiased MMD^2 between (N, E) samples and (N, E) prior draws"""
    n, d = z.shape
    c_base = 2.0 * d

    z = z.astype(jnp.float32)
    z_prior = z_prior.astype(jnp.float32)

    off_diag = 1.0 - jnp.eye(n, dtype=jnp.float32)
    kzz = _imq_kernel_sum(_pairwise_sq_dists(z, z), c_base)
    kpp = _imq_kernel_sum(_pairwise_sq_dists(z_prior, z_prior), c_base)
    kzp = _imq_kernel_sum(_pairwise_sq_dists(z, z_prior), c_base)

    denom = n * (n - 1)
    return (kzz * off_diag).sum() / denom + (kpp * off_diag).sum() / denom - 2.0 * kzp.mean()
