"""Residual conv-FFN blocks: SwiGLU and the FiLM-gated stack.

Parity with reference common/swiglu.py (depthwise conv -> gated SiLU ->
rms_norm -> dropout -> out proj, hidden = dim * expand * 2/3) and
models/latent/unet.py:22-53 (the pre-norm residual "layer" with zero-init
scale/shift/gate FiLM conditioning, out-norm, and 1e-3-gain block norms).

Channel-last layout: the depthwise conv is the only spatial op; every other
projection is a Dense over the lane dimension (an MXU matmul).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import RMSNorm, rms_norm

zeros_init = nn.initializers.zeros


def _pallas_swiglu_default() -> bool:
    """auto policy: use the fused Pallas kernel on TPU backends unless
    ODT_FUSED_SWIGLU overrides (0/1)"""
    override = os.environ.get("ODT_FUSED_SWIGLU")
    if override is not None:
        return override not in ("0", "false", "")
    from osu_dreamer_tpu.ops.policy import gspmd_sharding_active

    if gspmd_sharding_active():
        return False  # see ops/policy.py: GSPMD cannot partition the kernel
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


class DepthwiseConv(nn.Module):
    """width-K SAME depthwise conv as a K-tap shifted sum.

    Parameter-compatible with ``nn.Conv(features, (K,),
    feature_group_count=features)`` — kernel (K, 1, C), bias (C,) — but
    lowers to K fused multiply-adds instead of an XLA grouped convolution:
    grouped convs over narrow channel counts run at a few percent lane
    utilization on TPU (measured ~5 ms of the denoiser train step for the
    u-head's 6/64-channel pair alone)."""

    features: int
    width: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = self.width
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, 1, self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros_init, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        L = x.shape[1]
        lo = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, K - 1 - lo), (0, 0)))
        out = sum(xp[:, i : i + L, :] * k[i, 0] for i in range(K))
        return out + bias.astype(self.dtype)


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
    def __call__(self, x: jnp.ndarray, train: bool = False, params_only: bool = False):
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

        if params_only:
            # declare-and-return for fused layer kernels (ops/film_layer.py)
            # that consume the params directly under this module's path
            return (dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias)

        if self.seq_axis is not None:
            return self._sharded_forward(
                x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
                train,
            )

        use_fused = self.fused if self.fused is not None else _pallas_swiglu_default()
        if self.fused is None and use_fused:
            # heuristics measured on v5e (see tests/test_ops.py + ops/swiglu.py):
            # the kernel needs enough grid programs to pipeline DMA against
            # compute and lane-aligned channels. Training uses it too since
            # the flash-style backward kernel (ops/swiglu.py _bwd_kernel)
            # replaced the recompute-through-XLA backward — when its VMEM
            # footprint fits; _bwd falls back to the XLA path otherwise, so
            # gate on the same feasibility check to avoid a fwd-only win
            # being eaten by a slower fallback backward
            from osu_dreamer_tpu.ops.swiglu import DEFAULT_TILE, bwd_kernel_feasible

            B, L, C = x.shape
            programs = B * -(-L // DEFAULT_TILE)
            use_fused = programs >= 8 and C % 128 == 0
            if train and use_fused:
                h_dim_ = int(self.dim * self.expand * 2 / 3)
                use_fused = bwd_kernel_feasible(C, h_dim_, 1 + 2 * self.radius)
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
    fused: bool | None = None  # None = auto (fused layer kernel on TPU)

    def _use_fused_layer(self, x: jnp.ndarray, train: bool) -> bool:
        """fused norm+FiLM+SwiGLU+blocknorm+residual kernel
        (ops/film_layer.py): one HBM pass per layer per direction instead of
        a separate pass per arrow — the training-step win on conv-FFN
        stacks (latent step ~10% MFU on pure XLA). Applies when the
        backward's VMEM footprint fits and dropout is off."""
        if self.fused is not None:
            # an explicit override must still respect hard incompatibilities:
            # the fused kernel has no dropout (silently dropping training
            # regularization) and requires a depthwise conv (radius > 0)
            if self.fused:
                if self.radius <= 0:
                    raise ValueError("fused=True requires radius > 0")
                if self.dropout > 0 and train:
                    raise ValueError(
                        "fused=True is incompatible with dropout during "
                        "training (the fused kernel has no dropout)"
                    )
            return self.fused
        if self.radius <= 0 or (self.dropout > 0 and train):
            return False
        if not _pallas_swiglu_default():
            return False
        from osu_dreamer_tpu.ops.film_layer import feasible_fwd_tile, feasible_tile

        B, L, C = x.shape
        if C % 128 != 0 or B * -(-L // 512) < 8:
            return False
        # shape-cutoff escape hatch, default OFF (= fused at every feasible
        # shape). The standalone slope-timed A/B (benchmarks/film_ab.json)
        # suggested XLA wins fwd+bwd at L<=684, but the REAL latent train
        # step says otherwise (v5e, r5): all-fused 63.9 ms/step vs 65.1 with
        # ODT_FILM_FUSED_MIN_L=1024 (small layers on norm-XLA + SwiGLU
        # kernel) vs 78.8 pure-XLA small layers — the probe's checkpointed
        # scan does not reproduce the full step's fusion/memory behavior.
        min_l = int(os.environ.get("ODT_FILM_FUSED_MIN_L", "0"))
        if train and L < min_l:
            return False
        h_dim = int(self.dim * self.expand * 2 / 3)
        return (
            feasible_tile(C, h_dim, 1 + 2 * self.radius) is not None
            and feasible_fwd_tile(C, h_dim, 1 + 2 * self.radius) is not None
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert (cond is not None) == (self.cond_dim > 0), "cond <-> cond_dim mismatch"
        use_fused_layer = self._use_fused_layer(x, train)
        if use_fused_layer:
            from osu_dreamer_tpu.ops.film_layer import fused_film_layer

            x = x.astype(self.dtype)

        for i in range(self.n_layers):
            if cond is not None:
                film = nn.Dense(
                    3 * self.dim,
                    kernel_init=zeros_init,
                    bias_init=zeros_init,
                    dtype=self.dtype,
                    name=f"film{i}",
                )(cond)
                scale, shift, gate = jnp.split(film, 3, axis=-1)  # (B, C)
            else:
                scale = shift = gate = None

            norm1 = RMSNorm(self.dim, name=f"norm{i}")
            ffn = SwiGLU(
                self.dim, self.expand, self.radius, self.dropout,
                dtype=self.dtype, name=f"ffn{i}",
            )
            norm2 = RMSNorm(self.dim, gain=1e-3, name=f"blocknorm{i}")

            if use_fused_layer:
                if scale is None:
                    zero = jnp.zeros((x.shape[0], self.dim), self.dtype)
                    scale = shift = gate = zero
                g1 = norm1(x, params_only=True)
                swp = ffn(x, params_only=True)
                g2 = norm2(x, params_only=True)
                x = fused_film_layer(x, scale, shift, gate, g1, g2, *swp)
                continue

            if scale is None:
                scale = shift = gate = 0.0
            else:
                scale, shift, gate = (v[:, None, :] for v in (scale, shift, gate))
            h = norm1(x) * (1 + scale) + shift
            h = ffn(h, train=train)
            h = norm2(h)
            x = x + h * (1 + gate)

        return RMSNorm(self.dim, name="out_norm")(x)
