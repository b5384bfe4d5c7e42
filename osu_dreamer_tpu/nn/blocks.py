"""Residual conv-FFN blocks: SwiGLU and the FiLM-gated stack.

Parity with reference common/swiglu.py (depthwise conv -> gated SiLU ->
rms_norm -> dropout -> out proj, hidden = dim * expand * 2/3) and
models/latent/unet.py:22-53 (the pre-norm residual "layer" with zero-init
scale/shift/gate FiLM conditioning, out-norm, and 1e-3-gain block norms).

Channel-last layout: the depthwise conv is the only spatial op; every other
projection is a Dense over the lane dimension (an MXU matmul).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import RMSNorm, rms_norm

zeros_init = nn.initializers.zeros


class SwiGLU(nn.Module):
    """depthwise-conv gated FFN: x -> dwconv -> [v|g] -> v*silu(g) -> norm -> out"""

    dim: int
    expand: int = 2
    radius: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h_dim = int(self.dim * self.expand * 2 / 3)
        if self.radius > 0:
            x = nn.Conv(
                self.dim,
                kernel_size=(1 + 2 * self.radius,),
                feature_group_count=self.dim,
                dtype=self.dtype,
                name="dw",
            )(x)
        vg = nn.Dense(2 * h_dim, dtype=self.dtype, name="vg")(x)
        v, g = jnp.split(vg, 2, axis=-1)
        h = rms_norm(v * nn.silu(g))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class FilmStack(nn.Module):
    """n pre-norm residual SwiGLU blocks, each optionally FiLM-modulated
    (zero-init scale/shift/gate from a per-item conditioning vector):

        x <- x + block(norm(x) * (1 + scale) + shift) * (1 + gate)

    followed by an output norm. cond_dim = 0 builds an unconditional stack.
    """

    dim: int
    cond_dim: int
    n_layers: int
    expand: int = 2
    radius: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert (cond is not None) == (self.cond_dim > 0), "cond <-> cond_dim mismatch"

        for i in range(self.n_layers):
            if cond is not None:
                film = nn.Dense(
                    3 * self.dim,
                    kernel_init=zeros_init,
                    bias_init=zeros_init,
                    dtype=self.dtype,
                    name=f"film{i}",
                )(cond)[:, None, :]
                scale, shift, gate = jnp.split(film, 3, axis=-1)
            else:
                scale = shift = gate = 0.0

            h = RMSNorm(self.dim, name=f"norm{i}")(x) * (1 + scale) + shift
            h = SwiGLU(
                self.dim, self.expand, self.radius, self.dropout,
                dtype=self.dtype, name=f"ffn{i}",
            )(h, train=train)
            h = RMSNorm(self.dim, gain=1e-3, name=f"blocknorm{i}")(h)
            x = x + h * (1 + gate)

        return RMSNorm(self.dim, name="out_norm")(x)
