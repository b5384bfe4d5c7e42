"""Fused RoPE attention as a Pallas TPU kernel.

The reference attention block (common/attn.py:62-83) is: fused qkv
projection -> fp32 q/k RMS norms -> rotary embedding -> scaled dot-product
attention. Under XLA each stage is a separate fusion with layout changes
between them; profiling a denoiser train step shows ~35% of device time in
the attention ecosystem, half of it pure layout copies ((B,L,3,H,D) splits,
(B,L,H,D)<->(B,H,L,D) transposes) and materialized (L,L) probability
matrices round-tripping HBM.

This kernel runs the whole post-projection block in one VMEM pass:

  grid (B, L/blk_q):
    q tile   (blk_q, H*D) <- packed qkv, slot 0   (no split copies)
    k/v full (L,     H*D) <- packed qkv, slots 1/2 (fetched once per batch)
    per head h (static loop):
      fp32 RMS norm * gamma, rotary rotation      (VPU, fp32)
      s = q_h k_h^T / sqrt(D), key-padding mask    (MXU, fp32 accum)
      softmax over the full key length             (VPU, fp32)
      o_h = p v_h                                  (MXU, fp32 accum)
    out tile (blk_q, H*D) in the layout the output projection consumes

Keys/values stay in VMEM for the whole row of q tiles, so there is no
flash streaming state to carry; softmax is exact per tile. For very long
sequences the VMEM budget caps out — the wrapper falls back to the XLA path
above ``MAX_FUSED_LEN`` (a 10-minute song is ~3.7k latent frames; the cap
covers every training config and typical songs).

Gradients: custom VJP recomputes through the pure-jnp reference
(`rope_attention_reference`), the same scheme as ops/swiglu.py — the kernel
accelerates the forward; the backward is XLA's, numerically consistent.

MEASURED VERDICT (v5e, 50-op amortized scan): at the training shape
(B128 L152 H16 D64) this kernel is 3.06 ms/op vs XLA's 2.91; at the
inference shape (B1 L759) 0.12 vs XLA's 0.06. XLA's fused attention +
layout pipeline is already at parity for these head counts/lengths — the
per-head (L, 64) lane slices leave half the VPU/MXU idle, and batching
heads would reintroduce the transposes the kernel exists to avoid. Kept as
an opt-in experiment (OSU_DREAMER_FUSED_ATTN=1); the XLA path stays the
default. Revisit if head_dim reaches 128 or lengths outgrow VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_LEN = 2048  # ~5.5 min of audio at latent rate; VMEM-bounded
_EPS = 1e-6


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def rope_tables(L: int, D: int, offset: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, D/2) fp32 cos/sin tables matching nn.attention.rope"""
    inv_freq = 10000.0 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / -D)
    pos = jnp.arange(L, dtype=jnp.float32) + offset
    angles = pos[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def rope_attention_reference(
    qkv: jnp.ndarray, q_gamma: jnp.ndarray, k_gamma: jnp.ndarray, n_heads: int
) -> jnp.ndarray:
    """pure-jnp composition the kernel must match: (B, L, 3*H*D) -> (B, L, H*D)"""
    from osu_dreamer_tpu.nn.attention import rope
    from osu_dreamer_tpu.nn.norm import rms_norm

    B, L, three_hd = qkv.shape
    H = n_heads
    D = three_hd // (3 * H)
    qkv5 = qkv.reshape(B, L, 3, H, D)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    q = rope(rms_norm(q, q_gamma))
    k = rope(rms_norm(k, k_gamma))
    y = jax.nn.dot_product_attention(q, k, v)
    return y.reshape(B, L, H * D)


def _kernel(
    q_ref, k_ref, v_ref, cosq, sinq, cosk, sink, qg, kg, out_ref,
    *, n_heads, head_dim, k_len, scale, out_dtype,
):
    H, D = n_heads, head_dim
    D2 = D // 2
    Lk = k_ref.shape[1]
    HD = H * D

    # key-padding mask as a compile-time constant pattern
    if k_len < Lk:
        key_valid = jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1) < k_len
    else:
        key_valid = None

    cq, sq = cosq[:].astype(jnp.float32), sinq[:].astype(jnp.float32)
    ck, sk = cosk[:].astype(jnp.float32), sink[:].astype(jnp.float32)

    def norm_rope(x, gamma, cos, sin):
        # fp32 RMS over D, gamma gain, split-half rotary rotation
        x = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + _EPS)
        x = x * inv * gamma[0].astype(jnp.float32)
        x1, x2 = x[:, :D2], x[:, D2:]
        return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)

    for h in range(H):
        lo = h * D
        q = norm_rope(q_ref[0, :, lo : lo + D], qg, cq, sq)  # (BQ, D) f32
        k = norm_rope(k_ref[0, :, lo : lo + D], kg, ck, sk)  # (Lk, D) f32

        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, Lk) f32
        if key_valid is not None:
            s = jnp.where(key_valid, s, -jnp.inf)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(jnp.bfloat16)

        o = jax.lax.dot_general(
            p, v_ref[0, :, lo : lo + D],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, D) f32
        out_ref[0, :, lo : lo + D] = o.astype(out_dtype)


def _fused_fwd_impl(qkv, q_gamma, k_gamma, *, n_heads, blk_q, interpret):
    B, L, three_hd = qkv.shape
    H = n_heads
    D = three_hd // (3 * H)
    assert D % 2 == 0, "head_dim must be even"

    Lp = _round_up(L, blk_q)
    if Lp != L:
        qkv = jnp.pad(qkv, ((0, 0), (0, Lp - L), (0, 0)))

    cos, sin = rope_tables(Lp, D)
    gq = q_gamma.astype(jnp.float32)[None]
    gk = k_gamma.astype(jnp.float32)[None]

    HD = H * D
    grid = (B, Lp // blk_q)
    # the Dense qkv layout is slot-major on the feature axis (q = lanes
    # [0:HD], k = [HD:2HD], v = [2HD:3HD]), so q/k/v are plain last-dim
    # blocks of the SAME tensor — no split, reshape, or transpose anywhere.
    # q is blocked over L; k/v cover the full (padded) length and their
    # index maps ignore the q-tile index, so the pipeline fetches them once
    # per batch row
    in_specs = [
        pl.BlockSpec((1, blk_q, HD), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp, HD), lambda b, t: (b, 0, 1), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp, HD), lambda b, t: (b, 0, 2), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_q, D // 2), lambda b, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_q, D // 2), lambda b, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lp, D // 2), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Lp, D // 2), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        partial(
            _kernel,
            n_heads=H, head_dim=D, k_len=L,
            scale=1.0 / (D ** 0.5), out_dtype=qkv.dtype,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, blk_q, H * D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lp, H * D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * D,
            bytes_accessed=4 * B * Lp * H * D * 2,
            transcendentals=B * H * Lp * Lp,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, cos, sin, cos, sin, gq, gk)
    return out[:, :L]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_rope_attention(qkv, q_gamma, k_gamma, n_heads, blk_q=256, interpret=False):
    """(B, L, 3*H*D) packed qkv -> (B, L, H*D) attention output with fused
    fp32 q/k RMS norms and rotary embedding. `interpret=True` runs the Pallas
    interpreter (CPU testing)."""
    return _fused_fwd_impl(
        qkv, q_gamma, k_gamma, n_heads=n_heads, blk_q=blk_q, interpret=interpret
    )


def _fwd(qkv, q_gamma, k_gamma, n_heads, blk_q, interpret):
    out = _fused_fwd_impl(
        qkv, q_gamma, k_gamma, n_heads=n_heads, blk_q=blk_q, interpret=interpret
    )
    return out, (qkv, q_gamma, k_gamma)


def _bwd(n_heads, blk_q, interpret, residuals, g):
    qkv, q_gamma, k_gamma = residuals
    _, vjp = jax.vjp(
        lambda a, b, c: rope_attention_reference(a, b, c, n_heads),
        qkv, q_gamma, k_gamma,
    )
    return vjp(g)


fused_rope_attention.defvjp(_fwd, _bwd)
