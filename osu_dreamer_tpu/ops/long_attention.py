"""Forward flash attention for full-song inference lengths.

The training-shape kernel (ops/fused_attention.py) holds the whole sequence
in VMEM and is capped at L=256. Full-song sampling runs the backbone at the
latent length of the entire track (~744 latents for a 2-minute song, ~1860
for 5 minutes), where the XLA path materializes the (B, H, L, L) f32 score
tensor in HBM: at B=4 songs, L=744, H=16 that is ~140 MiB written + re-read
per layer, ~0.4 ms of pure HBM traffic x 8 layers x 33 sampling passes —
the dominant memory cost of `predict` (the reference pays the same cost on
CUDA via materialized SDPA when flash is unavailable, reference
common/attn.py:82).

Neither kernel here materializes scores in HBM. Two variants, auto-selected
by sequence length:

- k/v-resident (L <= ~2048 at HD=1024): grid over (batch, q-blocks), the
  full rotated k/v rows stay VMEM-resident across q-blocks (their block
  index is constant per batch item, so Pallas fetches them once), and each
  (q-block, head) computes logits -> f32 softmax -> bf16 probability matmul
  entirely on-chip. No online-softmax accumulation is needed because every
  instance sees the full key length — one masked softmax over the row.
- k-blocked (marathon songs beyond the resident VMEM cap): grid over
  (batch, q-blocks, k-blocks) with classic online-softmax accumulation —
  f32 accumulator + per-head running max/denominator in VMEM scratch across
  k-steps — so VMEM usage is independent of L and 7-minute-plus songs keep
  the no-(L,L)-in-HBM property (VERDICT r2 item 4).

Layout follows ops/fused_attention.py: packed (L, H*D) lanes (full 128-lane
tiles instead of per-head D=64 half-lanes); only the attention contractions
loop over heads. Norm+RoPE stay in XLA here — at inference batch sizes their
elementwise HBM traffic is ~100x smaller than the score tensors, and keeping
them out lets this kernel scale L with only k/v + one logits block in VMEM.

Backward: falls back to the pure-XLA composition via custom_vjp (correct
everywhere, unoptimized). No training path attends beyond L=256 today —
the denoiser trains at L=152 (reference diffusion/model.yml:44) and longer
contexts scale out via ring attention (ops/ring_attention.py) instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM gate for the k/v-resident variant: k + v bf16 rows (2 * L * HD * 2B)
# + one (BLOCK_Q, L) f32 logits block + bf16 probabilities + q/out blocks
# (double-buffered). At HD=1024, L=2048: 8 MiB k/v + 2 MiB logits + 1 MiB
# probs + ~2 MiB q/out ~= 13 MiB of the ~16 MiB/core budget. Beyond that
# (marathon songs, > ~5.5 min), the k-blocked online-softmax variant below
# keeps the no-(L,L)-in-HBM property with VMEM usage independent of L.
MAX_RESIDENT_LEN = 2048
# backstop for the blocked variant: ~90 minutes of audio at the latent rate.
# Not a VMEM limit (the blocked working set is L-independent) — just a
# guard against silently accepting absurd shapes.
MAX_LONG_LEN = 32768
BLOCK_Q = 256
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _resident_fits(L: int, HD: int) -> bool:
    """whether the k/v-resident variant's working set fits VMEM"""
    from ._tiles import VMEM_BUDGET_BYTES

    if L > MAX_RESIDENT_LEN:
        return False
    Lp = _round_up(L, 128)
    kv = 2 * Lp * HD * 2          # k + v bf16, VMEM-resident whole
    logits = BLOCK_Q * Lp * 4     # one f32 logits block
    probs = BLOCK_Q * Lp * 2      # bf16 probabilities
    q_out = 2 * (2 * BLOCK_Q * HD * 2)  # q/out blocks, double-buffered
    return kv + logits + probs + q_out <= VMEM_BUDGET_BYTES


def _blocked_fits(L: int, HD: int) -> bool:
    """whether the k-blocked online-softmax variant fits: its working set is
    L-independent (q/k/v/out blocks + f32 accumulator + running stats)"""
    from ._tiles import VMEM_BUDGET_BYTES

    if L > MAX_LONG_LEN:
        return False
    blocks = 2 * (BLOCK_Q * HD * 2) * 2 + 2 * (2 * BLOCK_Q * HD * 2)  # q,k,v,out dbl-buffered
    acc = BLOCK_Q * HD * 4                                            # f32 accumulator
    stats = 2 * BLOCK_Q * 128 * 4                                     # m, l (lane-padded)
    logits = BLOCK_Q * BLOCK_Q * 4 + BLOCK_Q * BLOCK_Q * 2
    return blocks + acc + stats + logits <= VMEM_BUDGET_BYTES


def long_attention_fits(L: int, n_heads: int, head_dim: int) -> bool:
    """shape gate for the long-sequence forward kernels: lane-aligned packed
    heads AND a working set that fits the shared VMEM budget (caps only
    bound it at HD = 1024 bf16 — wider models must fall back to XLA instead
    of failing Pallas compilation)"""
    HD = n_heads * head_dim
    if HD % 128 != 0 or n_heads > 128:
        return False
    return _resident_fits(L, HD) or _blocked_fits(L, HD)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, n_heads, head_dim, k_len, scale):
    H, D = n_heads, head_dim
    q = q_ref[0]  # (BLOCK_Q, HD) bf16, already normed + rotated
    k = k_ref[0]  # (Lp, HD)
    v = v_ref[0]  # (Lp, HD)

    Lp = k.shape[0]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Lp), 1) < k_len
        if k_len < Lp else None
    )
    outs = []
    for h in range(H):
        lo = h * D
        s = jax.lax.dot_general(
            q[:, lo : lo + D], k[:, lo : lo + D],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_Q, Lp) f32 — lives only in VMEM
        if valid is not None:
            s = jnp.where(valid, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        o = jax.lax.dot_general(
            p, v[:, lo : lo + D],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)  # one full-lane store


def _pack(x: jnp.ndarray) -> jnp.ndarray:
    B, L, H, D = x.shape
    return x.reshape(B, L, H * D)


BLOCK_K = 512


def _blocked_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, n_heads, head_dim, k_len, scale,
):
    """online-softmax flash attention: grid (batch, q-block, k-block) with
    the k-block dimension innermost; the f32 accumulator and per-head
    running max/denominator live in VMEM scratch across k-steps, so VMEM
    usage is independent of sequence length."""
    H, D = n_heads, head_dim
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, HD) bf16, already normed + rotated
    k = k_ref[0]  # (BK, HD)
    v = v_ref[0]
    BK = k.shape[0]
    valid = None
    if k_len % BK != 0:  # only the tail block can be ragged
        base = j * BK
        valid = base + jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1) < k_len

    m_all = m_ref[...]  # (BQ, H) f32
    l_all = l_ref[...]
    acc_all = acc_ref[...]  # (BQ, HD) f32
    acc_parts, m_parts, l_parts = [], [], []
    for h in range(H):
        lo = h * D
        s = jax.lax.dot_general(
            q[:, lo : lo + D], k[:, lo : lo + D],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) f32
        if valid is not None:
            s = jnp.where(valid, s, _NEG)
        m_old = m_all[:, h : h + 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)  # 0 at the first step (m_old = _NEG)
        p = jnp.exp(s - m_new)
        l_parts.append(l_all[:, h : h + 1] * alpha + jnp.sum(p, -1, keepdims=True))
        m_parts.append(m_new)
        pv = jax.lax.dot_general(
            p.astype(q.dtype), v[:, lo : lo + D],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc_parts.append(acc_all[:, lo : lo + D] * alpha + pv)
    # full-width stores once per k-step (per-head sub-writes serialize)
    acc_ref[...] = jnp.concatenate(acc_parts, axis=1)
    m_ref[...] = jnp.concatenate(m_parts, axis=1)
    l_ref[...] = jnp.concatenate(l_parts, axis=1)

    @pl.when(j == nk - 1)
    def _():
        acc = acc_ref[...]
        l = l_ref[...]
        outs = [
            acc[:, h * D : (h + 1) * D] / l[:, h : h + 1] for h in range(H)
        ]
        o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _blocked_impl(q, k, v, interpret):
    """(B, L, H, D) bf16 q/k/v -> (B, L, H*D), VMEM independent of L"""
    B, L, H, D = q.shape
    HD = H * D
    Lp = _round_up(L, BLOCK_K)  # BLOCK_K is a multiple of BLOCK_Q
    qp, kp, vp = _pack(q), _pack(k), _pack(v)
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        qp, kp, vp = jnp.pad(qp, pad), jnp.pad(kp, pad), jnp.pad(vp, pad)
    nq, nk = Lp // BLOCK_Q, Lp // BLOCK_K

    q_spec = pl.BlockSpec(
        (1, BLOCK_Q, HD), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, BLOCK_K, HD), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(
            _blocked_kernel, n_heads=H, head_dim=D, k_len=L,
            scale=1.0 / (D ** 0.5),
        ),
        grid=(B, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp, HD), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q, HD), jnp.float32),
            pltpu.VMEM((BLOCK_Q, H), jnp.float32),
            pltpu.VMEM((BLOCK_Q, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * D,
            bytes_accessed=B * nq * Lp * HD * 4 + 2 * B * Lp * HD * 2,
            transcendentals=B * H * Lp * Lp,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :L]


def _fwd_impl(q, k, v, interpret):
    """(B, L, H, D) bf16 q/k/v (norm+rope already applied) -> (B, L, H*D)"""
    B, L, H, D = q.shape
    HD = H * D
    if not _resident_fits(L, HD):
        return _blocked_impl(q, k, v, interpret)
    Lp = _round_up(L, BLOCK_Q)
    qp, kp, vp = _pack(q), _pack(k), _pack(v)
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        qp, kp, vp = jnp.pad(qp, pad), jnp.pad(kp, pad), jnp.pad(vp, pad)
    nq = Lp // BLOCK_Q

    q_spec = pl.BlockSpec(
        (1, BLOCK_Q, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, Lp, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(
            _fwd_kernel, n_heads=H, head_dim=D, k_len=L, scale=1.0 / (D ** 0.5)
        ),
        grid=(B, nq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lp * Lp * D,
            bytes_accessed=2 * B * Lp * HD * 4,
            transcendentals=B * H * Lp * Lp,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :L]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def long_flash_attention(q, k, v, interpret=False):
    """full-row flash attention over (B, L, H, D) -> packed (B, L, H*D).

    q/k/v carry norm+RoPE already (the XLA path in nn/attention.py computes
    them); numerics match ``jax.nn.dot_product_attention``: f32 logits and
    softmax, bf16 probability matmul with f32 accumulation.
    """
    return _fwd_impl(q, k, v, interpret)


def _xla_reference(q, k, v):
    B, L, H, D = q.shape
    return jax.nn.dot_product_attention(q, k, v).reshape(B, L, H * D)


def _vjp_fwd(q, k, v, interpret):
    # custom_vjp passes nondiff_argnums in place to fwd (prepended only to bwd)
    return _fwd_impl(q, k, v, interpret), (q, k, v)


def _vjp_bwd(interpret, res, g):
    # unoptimized XLA backward: no training path attends at long L (see
    # module docstring); correctness is still required under jax.grad
    q, k, v = res
    _, pullback = jax.vjp(_xla_reference, q, k, v)
    return pullback(g)


long_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
