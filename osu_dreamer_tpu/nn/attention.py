"""RoPE self-attention.

Parity with reference common/attn.py:62-83 (SDPSA): fused qkv projection,
fp32 RMS-normalized q/k per head, rotary position embedding, scaled
dot-product attention, output projection. The rotary table is computed inside
the traced function (cheap, fused by XLA) instead of a device-keyed Python
cache; attention itself lowers to the XLA TPU flash-attention path via
``jax.nn.dot_product_attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import rms_norm


def _pallas_attn_enabled() -> bool:
    """the shared gate for BOTH attention kernels: TPU backend ONLY (the
    Mosaic BlockSpecs lower nowhere else — on GPU the XLA path is correct
    and the kernel would crash), and not explicitly disabled via
    OSU_DREAMER_XLA_ATTN=1 (A/B escape hatch)"""
    import os

    if os.environ.get("OSU_DREAMER_XLA_ATTN", "0") == "1":
        return False
    from osu_dreamer_tpu.ops.policy import gspmd_sharding_active

    if gspmd_sharding_active():
        # GSPMD cannot partition tpu_custom_call: under a plain-jit sharded
        # step the kernel would force replicated operands (all-gather the
        # global batch); the XLA path partitions correctly
        return False
    return jax.default_backend() == "tpu"


def _flash_ok(L: int, n_heads: int, head_dim: int) -> bool:
    """use the fused Pallas kernel: shapes inside the VMEM budget"""
    if not _pallas_attn_enabled():
        return False
    from osu_dreamer_tpu.ops.fused_attention import fused_attention_fits

    return fused_attention_fits(L, n_heads, head_dim)


def _prologue_ok(C: int, F: int) -> bool:
    """use the fused norm+FiLM+qkv prologue kernel (ops/film_qkv.py): TPU
    backend, lane-aligned dims, fwd AND bwd footprints inside VMEM (a
    fwd-only win must not be eaten by a slower fallback backward). Safe
    under shard_map (the projection is position-local), gated off under
    plain-jit GSPMD like every other kernel.

    Default OFF pending a measured win: slope-timed (dispatch-floor-free)
    the XLA chain runs the prologue at 0.88 MXU at the denoiser train shape
    (benchmarks/half_layer_probe.json) — the kernel's per-batch-row matmuls
    measure 0.80. OSU_DREAMER_FUSED_PROLOGUE=1 enables for A/B runs."""
    import os

    if os.environ.get("OSU_DREAMER_FUSED_PROLOGUE", "0") != "1":
        return False
    if not _pallas_attn_enabled():
        return False
    if C % 128 != 0 or F % 128 != 0:
        return False
    from osu_dreamer_tpu.ops.film_qkv import feasible_bwd_tile, feasible_fwd_tile

    return (
        feasible_fwd_tile(C, F) is not None
        and feasible_bwd_tile(C, F) is not None
    )


def _long_flash_ok(L: int, n_heads: int, head_dim: int) -> bool:
    """use the long-sequence forward kernel (full-song inference lengths):
    beyond the fully-fused kernel's VMEM cap but inside the long kernel's"""
    if not _pallas_attn_enabled():
        return False
    from osu_dreamer_tpu.ops.fused_attention import fused_attention_fits
    from osu_dreamer_tpu.ops.long_attention import long_attention_fits

    return not fused_attention_fits(L, n_heads, head_dim) and long_attention_fits(
        L, n_heads, head_dim
    )


def rope(x: jnp.ndarray, offset: jnp.ndarray | int = 0) -> jnp.ndarray:
    """rotary position embedding over (B, L, H, D) with even D; `offset`
    shifts positions (used by sequence-parallel shards to index globally)"""
    _, L, _, D = x.shape
    assert D % 2 == 0, "head_dim must be even"
    inv_freq = 10000.0 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / -D)
    positions = jnp.arange(L, dtype=jnp.float32) + offset
    angles = positions[:, None] * inv_freq[None, :]  # (L, D/2)
    cos = jnp.cos(angles).astype(x.dtype)[None, :, None, :]
    sin = jnp.sin(angles).astype(x.dtype)[None, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _attention_einsum(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """scaled dot-product attention over (B, L, H, D) as explicit einsums —
    numerically identical to ``jax.nn.dot_product_attention`` (f32 logits +
    softmax regardless of input dtype, probability matmul in input dtype);
    faster under XLA:CPU's codegen"""
    D = q.shape[-1]
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


class _DenseParams(nn.Module):
    """declares an nn.Dense-compatible kernel/bias (same param paths, same
    fp32 param dtype, same initializers) and returns them raw — so the qkv
    projection can run either as a plain matmul or folded into the fused
    prologue kernel without a checkpoint-breaking param rename"""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class RoPEAttention(nn.Module):
    """multi-head self-attention over (B, L, C) with RoPE and q/k norms.

    ``seq_axis`` names a mesh axis the LENGTH dimension is sharded over; when
    set (and the module runs under shard_map) attention becomes ring
    attention over that axis with globally-offset RoPE — long-context
    scale-out is a mesh change, not a rewrite (SURVEY.md §5).
    """

    n_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    seq_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        film: tuple[jnp.ndarray, jnp.ndarray] | None = None,
        add: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """``film=(scale, shift)`` (each (B, C)) folds the caller's pre-norm
        FiLM into the qkv projection. A fused Pallas prologue kernel exists
        (ops/film_qkv.py) but is env-gated OFF by default: slope timing at
        the denoiser train shape shows the XLA chain faster (0.88 vs 0.80
        MXU, benchmarks/half_layer_probe.json) — set
        ``OSU_DREAMER_FUSED_PROLOGUE=1`` for A/B runs or shapes where the
        kernel may win. ``add`` is an extra position-local stream injected
        after FiLM (the audio projection, reference
        models/diffusion/backbone.py:64-70)."""
        B, L, C_in = x.shape
        H, D = self.n_heads, self.head_dim

        qkv_kernel, qkv_bias = _DenseParams(3 * H * D, name="qkv")(C_in)
        wd = qkv_kernel.astype(self.dtype)
        bd = qkv_bias.astype(self.dtype)
        if film is None:
            h = x.astype(self.dtype)
            if add is not None:
                h = h + add.astype(self.dtype)
            qkv = h @ wd + bd
        else:
            scale, shift = film
            if _prologue_ok(C_in, 3 * H * D):
                from osu_dreamer_tpu.ops.film_qkv import film_qkv

                # the kernel takes a real `add` operand; only the fused path
                # materializes zeros when the caller passes none (a pallas
                # operand cannot be DCE'd — keep it off the XLA path)
                a = (
                    jnp.zeros((B, L, C_in), self.dtype)
                    if add is None else add.astype(self.dtype)
                )
                qkv = film_qkv(x.astype(self.dtype), scale, shift, a, wd, bd)
            else:
                h = rms_norm(x) * (1 + scale[:, None, :].astype(self.dtype))
                h = h + shift[:, None, :].astype(self.dtype)
                if add is not None:
                    h = h + add.astype(self.dtype)
                qkv = h.astype(self.dtype) @ wd + bd

        q_gamma = self.param("q_gamma", nn.initializers.ones, (D,), jnp.float32)
        k_gamma = self.param("k_gamma", nn.initializers.ones, (D,), jnp.float32)
        HD = H * D

        if self.seq_axis is None and _flash_ok(L, H, D):
            # fully-fused norm+rope+attention fwd/bwd Pallas kernels straight
            # off the packed qkv projection — no (L, L) tensors in HBM, no
            # split/transpose copies, no fp32 norm/rope round trips. Full-step
            # A/B (dispatch-free by construction, r4): denoiser train step
            # 60.0 ms/step with this kernel vs 132.3 ms with
            # OSU_DREAMER_XLA_ATTN=1 — 2.2x (ops/fused_attention.py)
            from osu_dreamer_tpu.ops.fused_attention import (
                fused_norm_rope_attention,
            )

            y = fused_norm_rope_attention(qkv, q_gamma, k_gamma, H)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(y)

        # XLA path: contiguous lane-block slices of the packed projection;
        # norms/rope run on free bitcast (B, L, H, D) views
        q = qkv[..., :HD].reshape(B, L, H, D)
        k = qkv[..., HD : 2 * HD].reshape(B, L, H, D)
        v = qkv[..., 2 * HD :].reshape(B, L, H, D)

        offset = 0
        if self.seq_axis is not None:
            offset = jax.lax.axis_index(self.seq_axis) * L

        q = rope(rms_norm(q, q_gamma), offset)
        k = rope(rms_norm(k, k_gamma), offset)

        if self.seq_axis is not None:
            from osu_dreamer_tpu.ops.ring_attention import ring_attention

            y = ring_attention(q, k, v, self.seq_axis)
        elif _long_flash_ok(L, H, D):
            # full-song inference lengths: no (L, L) tensors in HBM
            # (ops/long_attention.py); returns packed (B, L, H*D)
            from osu_dreamer_tpu.ops.long_attention import long_flash_attention

            y = long_flash_attention(q, k, v)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(y)
        elif jax.default_backend() == "cpu":
            # XLA:CPU lowers jax.nn.dot_product_attention ~25% slower than
            # the explicit einsum composition at inference lengths (measured
            # 248 vs 187 ms at L=759, H=16 on the bench host); identical math
            y = _attention_einsum(q, k, v)
        else:
            y = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(y.reshape(B, L, HD))
