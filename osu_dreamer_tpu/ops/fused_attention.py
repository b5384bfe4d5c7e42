"""Fully-fused attention block (norm + RoPE + attention), fwd AND bwd.

Profiling history (denoiser train step, B128 L152 H16 D64):
  - XLA everything: attention ecosystem ~58 ms of a ~104 ms step — HBM
    round-trips of bf16/f32 (B,H,L,L) probability tensors + qkv layout
    copies + fp32 norm/rope elementwise fusions.
  - Pallas attention alone (ops/flash_attention.py), norm/rope left in XLA:
    attention matmuls drop to ~18 ms but the norm/rope elementwise work
    reappears as ~26 ms of full-size packed fusions (f32 (B,L,H*D) tensors
    round-tripping HBM between the qkv projection and the kernel). Net zero.

Conclusion: the win requires ONE kernel spanning qkv-projection-output to
attention-output, in both directions. This kernel consumes the packed
(B, L, 3*H*D) Dense output directly and emits (B, L, H*D); backward emits
d(qkv) and the two gamma grads. Between the two Dense layers nothing touches
HBM but the kernel's own input/output rows — no (L, L) tensors, no split or
transpose copies, no fp32 intermediate round trips.

In-kernel layout trick: norms and rope run on the FULL packed (L, H*D)
array (8x the lane efficiency of per-head (L, D) slices):
  - per-head RMS statistics: x^2 @ M where M is a constant (H*D, H)
    block-indicator/D matrix (grouped mean as an MXU op), broadcast back
    with the transpose indicator E (H, H*D);
  - rotary rotation: r = n*C + (n @ P)*Sn where P is the constant half-swap
    permutation within each head block and C/Sn are packed cos/sin tables.
Only the attention matmuls themselves loop over heads (their contraction is
per-head by definition).

Numerics match the XLA path (nn/attention.py): f32 norm statistics, bf16
normalized values * bf16 gamma, bf16 rotary multiplies, f32 logits/softmax,
bf16 probability matmul. Gradients are computed in f32 throughout.

Reference for the math being fused: common/attn.py:62-83 (SDPSA).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM-bounded: the bwd kernel's live set (double-buffered qkv/dqkv/do rows +
# packed f32 stats + per-head (L, L) temps + accumulated part lists) is
# ~9 MiB at L=152 / H*D=1024 and ~15.5 MiB at L=256 — the ~16 MiB/core
# ceiling. Longer sequences (full-song inference) take the XLA path, where
# batch sizes are small and the materialized (L, L) tensors are cheap.
MAX_FUSED_LEN = 256
_EPS = 1e-6
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_attention_fits(L: int, n_heads: int, head_dim: int) -> bool:
    """shape gate: VMEM-bounded working set, even rotary halves, lane-tile
    (128) aligned packed head dim (tiny test models fall back to XLA).

    The backward's live set scales ~ L * (n_heads * head_dim); the
    MAX_FUSED_LEN cap was measured at HD = 1024 (~15.5 MiB of the ~16 MiB
    core budget), so wider models must shrink L proportionally rather than
    pass the gate and fail Pallas compilation."""
    HD = n_heads * head_dim
    return (
        HD > 0
        and L * HD <= MAX_FUSED_LEN * 1024
        and head_dim % 2 == 0
        and HD % 128 == 0
    )


def rope_attention_reference(
    qkv: jnp.ndarray, q_gamma: jnp.ndarray, k_gamma: jnp.ndarray, n_heads: int
) -> jnp.ndarray:
    """pure-jnp composition the kernel must match:
    (B, L, 3*H*D) -> (B, L, H*D)"""
    from osu_dreamer_tpu.nn.attention import rope
    from osu_dreamer_tpu.nn.norm import rms_norm

    B, L, three_hd = qkv.shape
    H = n_heads
    D = three_hd // (3 * H)
    HD = H * D
    q = qkv[..., :HD].reshape(B, L, H, D)
    k = qkv[..., HD : 2 * HD].reshape(B, L, H, D)
    v = qkv[..., 2 * HD :].reshape(B, L, H, D)
    q = rope(rms_norm(q, q_gamma))
    k = rope(rms_norm(k, k_gamma))
    return jax.nn.dot_product_attention(q, k, v).reshape(B, L, HD)


def _constants(Lp: int, H: int, D: int, dtype):
    """packed rope tables + head-group matmul helpers (all constants)"""
    HD = H * D
    inv_freq = 10000.0 ** (jnp.arange(0, D, 2, dtype=jnp.float32) / -D)
    pos = jnp.arange(Lp, dtype=jnp.float32)
    ang = pos[:, None] * inv_freq[None, :]  # (Lp, D/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    C = jnp.tile(jnp.concatenate([cos, cos], -1), (1, H)).astype(dtype)
    Sn = jnp.tile(jnp.concatenate([-sin, sin], -1), (1, H)).astype(dtype)

    # The half-swap permutation is block-diagonal (one D-block per head) with
    # every block identical, so x @ P factors into per-lane-tile matmuls with
    # ONE shared (bs, bs) block: bs = the smallest multiple of D that is
    # lane-tile (128) aligned. This cuts the permutation matmul from
    # 2*L*HD^2 flops to 2*L*HD*bs — 8x at HD=1024/D=64 — while staying a
    # pure MXU op. Falls back to the full (HD, HD) matrix when HD isn't
    # divisible by the aligned block.
    bs = D
    while bs % 128 != 0:
        bs += D
    if HD % bs != 0:
        bs = HD
    idx = jnp.arange(bs)
    swapped = (idx // D) * D + ((idx % D) + D // 2) % D
    P = (idx[:, None] == swapped[None, :]).astype(dtype)  # x @ P = half-swap

    idx = jnp.arange(HD)
    head = idx // D
    M = (head[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32) / D
    E = (jnp.arange(H)[:, None] == head[None, :]).astype(jnp.float32)
    return C, Sn, P, M, E


def _apply_half_swap(n, P):
    """x @ blockdiag(P, P, ...): per-128-lane-tile matmuls with the shared
    permutation block (exact — P is a 0/1 permutation)"""
    bs = P.shape[0]
    HD = n.shape[1]
    if bs == HD:
        return jax.lax.dot_general(
            n, P, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    parts = [
        jax.lax.dot_general(
            n[:, i * bs : (i + 1) * bs], P,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        for i in range(HD // bs)
    ]
    return jnp.concatenate(parts, axis=1)


def _norm_rope(x, C, Sn, P, M, E, gamma):
    """packed (Lp, HD) bf16 -> normalized, gamma-scaled, rotated (Lp, HD)"""
    xf = x.astype(jnp.float32)
    msq = jax.lax.dot_general(
        xf * xf, M, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lp, H) per-head mean of squares
    inv = jax.lax.rsqrt(msq + _EPS)
    invb = jax.lax.dot_general(
        inv, E, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lp, HD)
    n = (xf * invb).astype(x.dtype) * gamma  # bf16, matching the XLA path
    swapped = _apply_half_swap(n, P).astype(x.dtype)
    r = n * C + swapped * Sn
    return r, inv


def _fwd_kernel(
    qkv_ref, C_ref, Sn_ref, P_ref, M_ref, E_ref, gq_ref, gk_ref, o_ref,
    *refs, n_heads, head_dim, k_len, scale,
):
    """forward; with ``refs`` = (rq_ref, rk_ref, iq_ref, ik_ref) the rotated
    q/k rows and per-head inverse-RMS stats are ALSO written out as
    residuals so the backward kernel skips the whole norm+rope recompute
    (~35% of its matmul passes at the training config)"""
    H, D = n_heads, head_dim
    HD = H * D
    x = qkv_ref[0]
    C, Sn, P, M, E = C_ref[...], Sn_ref[...], P_ref[...], M_ref[...], E_ref[...]
    rq, inv_q = _norm_rope(x[:, :HD], C, Sn, P, M, E, gq_ref[...])
    rk, inv_k = _norm_rope(x[:, HD : 2 * HD], C, Sn, P, M, E, gk_ref[...])
    if refs:
        rq_ref, rk_ref, iq_ref, ik_ref = refs
        rq_ref[0] = rq
        rk_ref[0] = rk
        iq_ref[0] = inv_q
        ik_ref[0] = inv_k

    Lk = qkv_ref.shape[1]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1) < k_len
        if k_len < Lk else None
    )
    outs = []
    for h in range(H):
        lo = h * D
        s = jax.lax.dot_general(
            rq[:, lo : lo + D], rk[:, lo : lo + D],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale
        if valid is not None:
            s = jnp.where(valid, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)
        o = jax.lax.dot_general(
            p, x[:, 2 * HD + lo : 2 * HD + lo + D],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    # one full-lane store instead of H half-lane sub-writes
    o_ref[0] = jnp.concatenate(outs, axis=1)


def _bwd_kernel(
    qkv_ref, do_ref, rq_ref, rk_ref, iq_ref, ik_ref,
    C_ref, Sn_ref, P_ref, M_ref, E_ref, gq_ref, gk_ref,
    dqkv_ref, dgq_ref, dgk_ref,
    *, n_heads, head_dim, k_len, scale,
):
    H, D = n_heads, head_dim
    HD = H * D
    x = qkv_ref[0]
    C, Sn, P, M, E = C_ref[...], Sn_ref[...], P_ref[...], M_ref[...], E_ref[...]
    gq, gk = gq_ref[...], gk_ref[...]
    # residuals from the forward kernel: rotated rows + per-head 1/rms
    rq, rk = rq_ref[0], rk_ref[0]
    invb_q = jax.lax.dot_general(
        iq_ref[0], E, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    invb_k = jax.lax.dot_general(
        ik_ref[0], E, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    xq_f = x[:, :HD].astype(jnp.float32)
    xk_f = x[:, HD : 2 * HD].astype(jnp.float32)

    Lk = qkv_ref.shape[1]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, Lk), 1) < k_len
        if k_len < Lk else None
    )
    # phase 1: per-head attention backward, accumulated as value lists so
    # each packed tensor is stored once full-lane (half-lane sub-writes per
    # head measurably serialize the store pipeline)
    drq_parts, drk_parts, dv_parts = [], [], []
    for h in range(H):
        lo = h * D
        q = rq[:, lo : lo + D]
        k = rk[:, lo : lo + D]
        v = x[:, 2 * HD + lo : 2 * HD + lo + D]
        do = do_ref[0, :, lo : lo + D]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if valid is not None:
            s = jnp.where(valid, s, _NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Lq, Lk) f32
        pb = p.astype(x.dtype)

        dv_parts.append(jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dqkv_ref.dtype))

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(x.dtype)

        drq_parts.append(jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
        drk_parts.append(jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))

    dqkv_ref[0, :, 2 * HD :] = jnp.concatenate(dv_parts, axis=1)

    # phase 2: packed rope^T + norm^T back to the qkv projection output
    def back(dr, xf, invb, gamma, out_lo, dg_ref):
        # rope^T (P is its own inverse/transpose). The swap matmul runs in
        # bf16 — its result lands in the bf16 dqkv output anyway, and bf16
        # MXU passes are 2x the f32 rate.
        Cf, Snf = C.astype(jnp.float32), Sn.astype(jnp.float32)
        gn = dr * Cf + _apply_half_swap((dr * Snf).astype(x.dtype), P)
        nhat = xf * invb  # pre-gamma normalized values
        # (8, HD) block with the sum in row 0 (min sublane tile is 8)
        s = jnp.sum(gn * nhat, axis=0)[None, :]
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, s.shape[1]), 0) == 0
        dg_ref[0] = jnp.where(row0, jnp.broadcast_to(s, (8, s.shape[1])), 0.0)
        gh = gn * gamma.astype(jnp.float32)
        t = jax.lax.dot_general(
            gh * xf, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Lp, H): per-head mean of gh*x
        tb = jax.lax.dot_general(
            t, E, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dx = gh * invb - xf * invb * invb * invb * tb
        dqkv_ref[0, :, out_lo : out_lo + HD] = dx.astype(dqkv_ref.dtype)

    back(jnp.concatenate(drq_parts, axis=1), xq_f, invb_q, gq, 0, dgq_ref)
    back(jnp.concatenate(drk_parts, axis=1), xk_f, invb_k, gk, HD, dgk_ref)


def _prep(qkv, q_gamma, k_gamma, n_heads):
    B, L, three_hd = qkv.shape
    HD = three_hd // 3
    D = HD // n_heads
    Lp = _round_up(L, 8)
    if Lp != L:
        qkv = jnp.pad(qkv, ((0, 0), (0, Lp - L), (0, 0)))
    C, Sn, P, M, E = _constants(Lp, n_heads, D, qkv.dtype)
    gq = jnp.tile(q_gamma.astype(qkv.dtype), n_heads)[None]  # (1, HD)
    gk = jnp.tile(k_gamma.astype(qkv.dtype), n_heads)[None]
    return qkv, (C, Sn, P, M, E, gq, gk), B, L, Lp, HD, D


def _const_specs(C, Sn, P, M, E, gq, gk):
    full = lambda a: pl.BlockSpec(
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    return [full(C), full(Sn), full(P), full(M), full(E), full(gq), full(gk)]


def _fwd_impl(qkv, q_gamma, k_gamma, n_heads, interpret, save_residuals=False):
    qkv, consts, B, L, Lp, HD, D = _prep(qkv, q_gamma, k_gamma, n_heads)
    H = n_heads
    qkv_spec = pl.BlockSpec(
        (1, Lp, 3 * HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((1, Lp, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_specs = [out_spec]
    out_shapes = [jax.ShapeDtypeStruct((B, Lp, HD), qkv.dtype)]
    if save_residuals:
        inv_spec = pl.BlockSpec(
            (1, Lp, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [out_spec, out_spec, inv_spec, inv_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((B, Lp, HD), qkv.dtype),  # rq
            jax.ShapeDtypeStruct((B, Lp, HD), qkv.dtype),  # rk
            jax.ShapeDtypeStruct((B, Lp, H), jnp.float32),  # 1/rms q
            jax.ShapeDtypeStruct((B, Lp, H), jnp.float32),  # 1/rms k
        ]
    res = pl.pallas_call(
        partial(
            _fwd_kernel, n_heads=n_heads, head_dim=D, k_len=L,
            scale=1.0 / (D ** 0.5),
        ),
        grid=(B,),
        in_specs=[qkv_spec] + _const_specs(*consts),
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        # canonical attention flops only — the permutation/stat matmuls are
        # implementation overhead and counting them would inflate reported
        # MFU (XLA's cost analysis sums these estimates)
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_heads * Lp * Lp * D,
            bytes_accessed=8 * B * Lp * HD,
            transcendentals=B * n_heads * Lp * Lp,
        ),
        interpret=interpret,
    )(qkv, *consts)
    if save_residuals:
        out, rq, rk, iq, ik = res
        return out[:, :L], (rq, rk, iq, ik)
    return res[0][:, :L]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_norm_rope_attention(qkv, q_gamma, k_gamma, n_heads, interpret=False):
    """packed (B, L, 3*H*D) qkv projection output -> (B, L, H*D) attention
    output, with fp32-stat RMS norms (shared per-head-dim gammas) and RoPE
    fused in. Numerically equivalent to the XLA path in nn/attention.py."""
    return _fwd_impl(qkv, q_gamma, k_gamma, n_heads, interpret)


def _vjp_fwd(qkv, q_gamma, k_gamma, n_heads, interpret):
    out, (rq, rk, iq, ik) = _fwd_impl(
        qkv, q_gamma, k_gamma, n_heads, interpret, save_residuals=True
    )
    return out, (qkv, q_gamma, k_gamma, rq, rk, iq, ik)


def _vjp_bwd(n_heads, interpret, res, g):
    qkv_in, q_gamma, k_gamma, rq, rk, iq, ik = res
    qkv, consts, B, L, Lp, HD, D = _prep(qkv_in, q_gamma, k_gamma, n_heads)
    H = n_heads
    gp = g.astype(qkv.dtype)
    if Lp != L:
        gp = jnp.pad(gp, ((0, 0), (0, Lp - L), (0, 0)))
    qkv_spec = pl.BlockSpec(
        (1, Lp, 3 * HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    do_spec = pl.BlockSpec((1, Lp, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((1, 8, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dqkv, dgq, dgk = pl.pallas_call(
        partial(
            _bwd_kernel, n_heads=n_heads, head_dim=D, k_len=L,
            scale=1.0 / (D ** 0.5),
        ),
        grid=(B,),
        in_specs=[qkv_spec, do_spec, do_spec, do_spec, inv_spec, inv_spec]
        + _const_specs(*consts),
        out_specs=[qkv_spec, dg_spec, dg_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, 3 * HD), qkv.dtype),
            jax.ShapeDtypeStruct((B, 8, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, HD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        # canonical bwd flops only (see the fwd call's cost_estimate note)
        cost_estimate=pl.CostEstimate(
            flops=10 * B * n_heads * Lp * Lp * D,
            bytes_accessed=16 * B * Lp * HD,
            transcendentals=B * n_heads * Lp * Lp,
        ),
        interpret=interpret,
    )(qkv, gp, rq, rk, iq, ik, *consts)
    # gammas are (D,), shared across heads: fold batch, pad rows, head tiles
    dq_gamma = dgq.sum((0, 1)).reshape(n_heads, D).sum(0)
    dk_gamma = dgk.sum((0, 1)).reshape(n_heads, D).sum(0)
    return dqkv[:, :L], dq_gamma, dk_gamma


fused_norm_rope_attention.defvjp(_vjp_fwd, _vjp_bwd)
