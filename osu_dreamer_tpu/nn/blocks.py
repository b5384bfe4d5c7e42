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


def _pallas_swiglu_default() -> bool:
    """auto policy: use the fused Pallas kernel on TPU backends unless
    ODT_FUSED_SWIGLU overrides (0/1)"""
    import os

    override = os.environ.get("ODT_FUSED_SWIGLU")
    if override is not None:
        return override not in ("0", "false", "")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


class SwiGLU(nn.Module):
    """depthwise-conv gated FFN: x -> dwconv -> [v|g] -> v*silu(g) -> norm -> out.

    Owns its parameters directly so the same param tree serves both the
    reference XLA path and the fused Pallas TPU kernel (ops/swiglu.py);
    ``fused=None`` auto-selects by backend."""

    dim: int
    expand: int = 2
    radius: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    fused: bool | None = None
    # mesh axis the LENGTH dim is sharded over (inside shard_map): the
    # depthwise conv then halo-exchanges `radius` frames with ring
    # neighbors so sharded outputs equal the unsharded computation
    seq_axis: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h_dim = int(self.dim * self.expand * 2 / 3)
        K = 1 + 2 * self.radius
        lecun = nn.initializers.lecun_normal()

        dw_kernel = dw_bias = None
        if self.radius > 0:
            dw_kernel = self.param("dw_kernel", lecun, (K, self.dim), jnp.float32)
            dw_bias = self.param("dw_bias", zeros_init, (self.dim,), jnp.float32)
        vg_kernel = self.param("vg_kernel", lecun, (self.dim, 2 * h_dim), jnp.float32)
        vg_bias = self.param("vg_bias", zeros_init, (2 * h_dim,), jnp.float32)
        out_kernel = self.param("out_kernel", lecun, (h_dim, self.dim), jnp.float32)
        out_bias = self.param("out_bias", zeros_init, (self.dim,), jnp.float32)

        if self.seq_axis is not None:
            return self._sharded_forward(
                x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
                train,
            )

        use_fused = self.fused if self.fused is not None else _pallas_swiglu_default()
        if self.fused is None and use_fused:
            # heuristics measured on v5e (see tests/test_ops.py + ops/swiglu.py):
            # the kernel wins on inference when the grid has enough programs
            # to pipeline DMA against compute and channels are lane-aligned;
            # under training its recompute-based backward costs an extra
            # forward, so the XLA path wins there
            from osu_dreamer_tpu.ops.swiglu import DEFAULT_TILE

            B, L, C = x.shape
            programs = B * -(-L // DEFAULT_TILE)
            use_fused = (not train) and programs >= 8 and C % 128 == 0
        use_dropout = self.dropout > 0 and train
        if use_fused and self.radius > 0 and not use_dropout:
            from osu_dreamer_tpu.ops import fused_swiglu

            return fused_swiglu(
                x.astype(self.dtype), dw_kernel, dw_bias,
                vg_kernel, vg_bias, out_kernel, out_bias,
            )

        from osu_dreamer_tpu.ops import swiglu_reference

        if not use_dropout:
            return swiglu_reference(
                x.astype(self.dtype), dw_kernel, dw_bias,
                vg_kernel, vg_bias, out_kernel, out_bias,
            )

        # dropout sits between the norm and the out projection (reference
        # common/swiglu.py ordering), so inline the stages here
        x = x.astype(self.dtype)
        if dw_kernel is not None:
            xp = jnp.pad(x, ((0, 0), (self.radius, self.radius), (0, 0)))
            x = self._dwconv_taps(xp, x.shape[1], dw_kernel, dw_bias)
        return self._gated_tail(
            x, vg_kernel, vg_bias, out_kernel, out_bias, dropout=True
        )

    def _dwconv_taps(self, xp, L, dw_kernel, dw_bias):
        """depthwise conv as a tap sum over an already-padded/halo'd input"""
        return sum(
            xp[:, k : k + L, :] * dw_kernel[k].astype(xp.dtype)
            for k in range(1 + 2 * self.radius)
        ) + dw_bias.astype(xp.dtype)

    def _gated_tail(self, x, vg_kernel, vg_bias, out_kernel, out_bias, dropout):
        """post-conv stages: vg projection -> gated SiLU -> norm ->
        (dropout) -> out projection — shared by the inline and
        sequence-parallel paths so numerics can never diverge between them"""
        vg = x @ vg_kernel.astype(x.dtype) + vg_bias.astype(x.dtype)
        v, g = jnp.split(vg, 2, axis=-1)
        h = rms_norm(v * nn.silu(g))
        if dropout:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        return h @ out_kernel.astype(h.dtype) + out_bias.astype(h.dtype)

    def _sharded_forward(
        self, x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
        train: bool,
    ) -> jnp.ndarray:
        """sequence-parallel path (under shard_map): depthwise conv reads a
        ring halo so shard outputs equal the unsharded computation; every
        other stage is per-frame"""
        x = x.astype(self.dtype)
        if dw_kernel is not None:
            from osu_dreamer_tpu.ops.ring_attention import halo_exchange

            xp = halo_exchange(x, self.radius, self.seq_axis)
            x = self._dwconv_taps(xp, x.shape[1], dw_kernel, dw_bias)
        return self._gated_tail(
            x, vg_kernel, vg_bias, out_kernel, out_bias,
            dropout=self.dropout > 0 and train,
        )


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
