"""Fused FiLM-modulated SwiGLU residual layer as Pallas TPU kernels (fwd+bwd).

One FilmStack layer (nn/blocks.py FilmStack, reference latent/unet.py:22-53)
is, per position:

    h  = rms_norm(x) * g1 * (1 + scale) + shift      # pre-norm + FiLM
    h  = SwiGLU(h)                                    # dwconv -> vg -> silu
                                                      #   -> rms -> out proj
    h  = rms_norm(h) * g2                             # block norm (1e-3 gain)
    out = x + h * (1 + gate)                          # gated residual

Trained at (B=64, L~1026, C=128), XLA runs this chain at ~1.75 ms/layer
fwd+bwd — every arrow above is a separate HBM round trip of a (B, L, C) or
(B, L, 2H) tensor, and the step sits at ~10% MFU. These kernels run the
whole layer per L-tile out of VMEM:

- forward: one pass, one (B, L, C) read + one write;
- backward: flash-style — recompute the forward per tile on an r-extended
  region, emit dx (residual + branch) directly, and accumulate ALL grads
  (film scale/shift/gate per batch row; both norm gains; every SwiGLU
  weight/bias) in fp32 VMEM-resident output blocks across the sequential
  TPU grid. No forward residuals are saved beyond the inputs.

Semantics are validated against ``film_layer_reference`` (the exact jnp
composition FilmStack otherwise runs) in tests/test_ops.py; FilmStack
auto-dispatches here on TPU backends when the footprint fits VMEM.

Unconditioned stacks (cond_dim=0) pass zero scale/shift/gate — the kernel
math then reduces exactly to the plain pre-norm residual layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swiglu import _HALO, swiglu_reference

# starting tile for the VMEM-budget shrink search (ops/_tiles.py): narrow
# stacks (the latent U-Net's C=128/H=341) fit 1024-row tiles, which doubles
# the matmul M-dimension and halves grid-step overhead; wider dims shrink
# automatically in BOTH directions (backward via feasible_tile, forward via
# feasible_fwd_tile; e.g. C=384/H=1024 lands at 128/256 respectively)
DEFAULT_TILE = 1024


def film_layer_reference(
    x: jnp.ndarray,       # (B, L, C)
    scale: jnp.ndarray,   # (B, C)
    shift: jnp.ndarray,   # (B, C)
    gate: jnp.ndarray,    # (B, C)
    g1: jnp.ndarray,      # (C,) pre-norm gain
    g2: jnp.ndarray,      # (C,) block-norm gain
    dw_kernel: jnp.ndarray,
    dw_bias: jnp.ndarray,
    vg_kernel: jnp.ndarray,
    vg_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
) -> jnp.ndarray:
    """pure-jnp reference with identical semantics (and the backward
    fallback); bit-matches FilmStack's unfused layer body"""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    h = (xf * inv).astype(x.dtype) * g1.astype(x.dtype)
    h = h * (1 + scale[:, None, :].astype(x.dtype)) + shift[:, None, :].astype(x.dtype)
    h = swiglu_reference(h, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias)
    hf = h.astype(jnp.float32)
    inv2 = jax.lax.rsqrt(jnp.mean(hf * hf, axis=-1, keepdims=True) + 1e-6)
    h = (hf * inv2).astype(x.dtype) * g2.astype(x.dtype)
    return x + h * (1 + gate[:, None, :].astype(x.dtype))


# --------------------------------------------------------------- forward ----


def _rms_inv(xf: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """row 1/rms via an MXU ones-matmul (f32 in, f32 out).

    Mosaic lowers a last-axis ``jnp.mean`` to a log-depth cross-lane shuffle
    chain on the VPU — the fused layer runs three of those per tile and the
    VPU is the kernel's binder (the MXU sits ~70% idle at C=128). A
    (rows, C) @ (C, 128) all-ones matmul computes the same row sums on the
    MXU instead; for C == 128 every output column equals the row sum, so
    the result IS the broadcast inverse — no reduce and no re-broadcast.
    Measured (v5e, L=2052 latent shape): fwd 404 -> ~330 us with the two
    C-width norms converted."""
    inv = jax.lax.rsqrt(_row_mean_mxu(xf, xf) + eps)
    return inv


def _row_mean_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """row-wise ``mean(a * b, axis=-1, keepdims=True)`` as an MXU
    ones-matmul (see _rms_inv — same VPU-shuffle-chain avoidance). For
    C == 128 the (rows, 128) result is already the broadcast mean; other
    widths return a (rows, 1) column."""
    C = a.shape[-1]
    ones = jnp.ones((C, 128), jnp.float32)
    s = jax.lax.dot_general(
        a * b, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * (1.0 / C)
    return s if C == 128 else s[:, :1]


def _fwd_kernel(
    x_hbm, sc, sh, gt, g1, g2, dww, dwb, wvg, bvg, wout, bout,
    out_ref, xs, sem, *, tile, radius, h_dim, seq_len,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    K = 2 * radius + 1
    r = radius
    E = tile + 2 * r  # h1 region: core tile plus the conv halo
    f32 = jnp.float32

    # serial halo fetch. Cross-program double buffering (prefetch the next
    # program's tile before computing) was implemented and measured
    # slope-timed at every latent shape: NO change (L=2052 fwd 326 -> 329
    # us) — the input DMA is fully hidden behind Mosaic's output pipeline
    # already, so the extra buffer only cost VMEM. Reverted.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], xs, sem
    )
    copy.start()
    copy.wait()
    dt = xs.dtype

    # pre-norm + FiLM on the extended region (per-position, fp32 stats).
    # The conv must read ZERO outside [0, L) — shift makes h1 nonzero on
    # normed zero-padding, so mask by global position.
    pos = t * tile - r + jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    valid = (pos >= 0) & (pos < seq_len)
    xe = xs[_HALO - r : _HALO - r + E, :]
    xf = xe.astype(f32)
    n1 = _rms_inv(xf)
    # fold gain * (1 + scale) into ONE per-program f32 vector: two fewer
    # (E, C) multiplies per tile than applying g1 and (1 + scale) separately
    a1 = g1[0, :].astype(f32) * (1 + sc[0, 0, :].astype(f32))
    h1 = (xf * n1 * a1).astype(dt) + sh[0, 0, :].astype(dt)
    h1 = jnp.where(valid, h1, jnp.zeros_like(h1))

    # SwiGLU: conv taps read h1[e + k] for core output position e
    y = h1[r : r + tile, :] * dww[r, :]
    for k in range(K):
        if k != r:
            y += h1[k : k + tile, :] * dww[k, :]
    y += dwb[0, :]

    # gated FFN in the compute dtype (bf16 in production — matching the
    # unfused reference path, which keeps v/silu(g) in the SwiGLU compute
    # dtype and only lifts the norm STATISTICS to f32; halves the VPU width
    # of the elementwise chain). Mosaic requires a 32-bit matmul
    # accumulator, so the round-to-dt stays an explicit epilogue cast.
    vg = (jnp.dot(y, wvg[:, :], preferred_element_type=f32)
          + bvg[0, :].astype(f32)).astype(dt)
    v = vg[:, :h_dim]
    g = vg[:, h_dim:]
    # sigmoid stays f32 (Mosaic cannot lower the bf16 logistic); products bf16
    sig = (0.5 * jnp.tanh(0.5 * g.astype(f32)) + 0.5).astype(dt)
    spre = v * (g * sig)
    spre_f = spre.astype(f32)
    n = _rms_inv(spre_f)

    hn = (spre_f * n).astype(dt)

    o = (jnp.dot(hn, wout[:, :], preferred_element_type=f32)
         + bout[0, :].astype(f32))

    # block norm + gated residual (f32 stats); block gain and residual gate
    # fold into one per-program f32 vector like the film prologue
    n2 = _rms_inv(o)
    b2 = g2[0, :].astype(f32) * (1 + gt[0, 0, :].astype(f32))
    h2 = (o * n2 * b2).astype(dt)
    xc = xs[_HALO : _HALO + tile, :]
    out_ref[0, :, :] = (xc + h2).astype(out_ref.dtype)


# -------------------------------------------------------------- backward ----


def _bwd_kernel(
    x_hbm, go_hbm, sc, sh, gt, g1, g2, dww, dwb, wvg, bvg, wout, bout,
    dx_ref, dsc_ref, dsh_ref, dgt_ref, dg1_ref, dg2_ref,
    ddw_ref, ddwb_ref, dwvg_ref, dbvg_ref, dwout_ref, dbout_ref,
    xs, gos, sem_x, sem_g, *, tile, radius, h_dim, seq_len,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    K = 2 * radius + 1
    r = radius
    E = tile + 2 * r       # dY region
    EH = E + 2 * r         # h1 region feeding the dY region's convs
    f32 = jnp.float32

    cp_x = pltpu.make_async_copy(x_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], xs, sem_x)
    cp_g = pltpu.make_async_copy(go_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], gos, sem_g)
    cp_x.start()
    cp_g.start()

    @pl.when(t == 0)
    def _zero_film_accums():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dsh_ref[...] = jnp.zeros_like(dsh_ref)
        dgt_ref[...] = jnp.zeros_like(dgt_ref)

    @pl.when((b == 0) & (t == 0))
    def _zero_global_accums():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddwb_ref[...] = jnp.zeros_like(ddwb_ref)
        dwvg_ref[...] = jnp.zeros_like(dwvg_ref)
        dbvg_ref[...] = jnp.zeros_like(dbvg_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    cp_x.wait()
    cp_g.wait()
    dt = xs.dtype

    # ---- recompute forward: h1 on EH rows, the rest on E rows.
    # h1 must be ZERO outside [0, L) — the reference conv reads zero
    # padding there, but shift makes h1 nonzero on normed zeros.
    pos_h = t * tile - 2 * r + jax.lax.broadcasted_iota(jnp.int32, (EH, 1), 0)
    valid_h = (pos_h >= 0) & (pos_h < seq_len)
    xh = xs[_HALO - 2 * r : _HALO - 2 * r + EH, :]
    xhf = xh.astype(f32)
    n1 = _rms_inv(xhf)
    xn = (xhf * n1).astype(dt)                      # normalized x (no gain)
    one_sc = 1 + sc[0, 0, :].astype(dt)
    h1 = xn * g1[0, :].astype(dt) * one_sc + sh[0, 0, :].astype(dt)
    h1 = jnp.where(valid_h, h1, jnp.zeros_like(h1))

    y = h1[r : r + E, :] * dww[r, :]
    for k in range(K):
        if k != r:
            y += h1[k : k + E, :] * dww[k, :]
    y += dwb[0, :]

    # gated FFN recompute in the compute dtype (bit-matches the fwd kernel
    # and the unfused reference path; f32 for norm statistics only)
    vg = (jnp.dot(y, wvg[:, :], preferred_element_type=f32)
          + bvg[0, :].astype(f32)).astype(dt)
    v = vg[:, :h_dim]
    g = vg[:, h_dim:]
    # tanh form matches the fwd kernel's recompute bit-for-bit (see there)
    sig = (0.5 * jnp.tanh(0.5 * g.astype(f32)) + 0.5).astype(dt)
    sil = g * sig
    spre_f = (v * sil).astype(f32)
    n = _rms_inv(spre_f)
    hn = (spre_f * n).astype(dt)

    o = jnp.dot(hn, wout[:, :], preferred_element_type=f32)
    o += bout[0, :].astype(f32)
    n2 = _rms_inv(o)
    on = o * n2                                     # normalized out (fp32)

    # ---- backward chain on the E region
    go_e = gos[_HALO - r : _HALO - r + E, :].astype(f32)
    dh2 = go_e * (1 + gt[0, 0, :].astype(f32))         # grad at g2*normed out
    don = dh2 * g2[0, :].astype(f32)
    do = n2 * don - (n2 * n2 * n2) * o * _row_mean_mxu(don, o)

    dhn = jax.lax.dot_general(
        do.astype(dt), wout[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    dspre = n * dhn - (n * n * n) * spre_f * _row_mean_mxu(dhn, spre_f)
    dv = dspre * sil.astype(f32)
    dg = dspre * v.astype(f32) * (sig * (1.0 + g * (1.0 - sig))).astype(f32)
    dvg = jnp.concatenate([dv, dg], axis=-1).astype(dt)
    dY = jax.lax.dot_general(
        dvg, wvg[:, :], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )

    # ---- dh1 at core rows (transpose conv), then film/norm1 backward.
    # Mask out-of-sequence core rows: the transpose conv pulls real dY from
    # in-sequence neighbors into cropped rows, which must not pollute the
    # film/gain grad sums (dx there is cropped anyway).
    dh1 = dY[2 * r : 2 * r + tile, :] * dww[0, :].astype(f32)
    for k in range(1, K):
        dh1 += dY[2 * r - k : 2 * r - k + tile, :] * dww[k, :].astype(f32)
    pos_c = t * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    dh1 = jnp.where(pos_c < seq_len, dh1, jnp.zeros_like(dh1))

    core_h = slice(2 * r, 2 * r + tile)             # core rows in EH indexing
    xn_c = xn[core_h, :].astype(f32)
    xf_c = xhf[core_h, :]
    n1_c = n1[core_h, :]
    g1f = g1[0, :].astype(f32)
    one_sc_f = 1 + sc[0, 0, :].astype(f32)

    dsc_ref[0, 0, :] += jnp.sum(dh1 * xn_c * g1f, axis=0)
    dsh_ref[0, 0, :] += jnp.sum(dh1, axis=0)
    dg1_ref[0, :] += jnp.sum(dh1 * one_sc_f * xn_c, axis=0)
    dxn = dh1 * g1f * one_sc_f
    dx_branch = n1_c * dxn - (n1_c * n1_c * n1_c) * xf_c * _row_mean_mxu(dxn, xf_c)

    core_e = slice(r, r + tile)                     # core rows in E indexing
    go_c = gos[_HALO : _HALO + tile, :].astype(f32)
    h2_c = (on[core_e, :] * g2[0, :].astype(f32))
    dgt_ref[0, 0, :] += jnp.sum(go_c * h2_c, axis=0)
    dg2_ref[0, :] += jnp.sum(dh2[core_e, :] * on[core_e, :], axis=0)

    dx_ref[0, :, :] = (go_c + dx_branch).astype(dx_ref.dtype)

    # ---- SwiGLU weight/bias grads over core rows
    dout_c = do[core_e, :].astype(dt)
    hn_c = hn[core_e, :]
    y_c = y[core_e, :]
    dvg_c = dvg[core_e, :]
    dY_c = dY[core_e, :]

    dwout_ref[...] += jax.lax.dot_general(
        hn_c, dout_c, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    dbout_ref[0, :] += jnp.sum(do[core_e, :], axis=0)
    dwvg_ref[...] += jax.lax.dot_general(
        y_c, dvg_c, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    dbvg_ref[0, :] += jnp.sum(dvg_c.astype(f32), axis=0)
    # ddw[k] = sum_p dY[p] * h1[p + k - r]: h1 row (in EH) = l + r + k
    for k in range(K):
        hk = h1[r + k : r + k + tile, :]
        ddw_ref[k, :] += jnp.sum(dY_c * hk.astype(f32), axis=0)
    ddwb_ref[0, :] += jnp.sum(dY_c, axis=0)


# ------------------------------------------------------------- wrappers -----


def _film_specs(B, C, H, K):
    """per-batch-row film vectors + broadcast weights. Film rows travel as
    (B, 1, C) so each block is (1, 1, C) — the TPU lowering requires the
    last two block dims to be (8k, 128k) or equal to the array dims, which
    a (1, C) block of a (B, C) array violates."""
    return [
        pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),  # scale
        pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),  # shift
        pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),  # gate
        pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),   # g1
        pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),   # g2
        pl.BlockSpec((K, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
    ]


def _prep(x, L, tile):
    # balanced tiles: with a fixed cap, L=684 would pad to 2x512 (33% of
    # every kernel program spent on padding rows); instead split L into the
    # same NUMBER of tiles the cap implies, each just big enough (8-aligned)
    n = max(1, -(-L // max(8, tile)))
    per = -(-L // n)
    tile = max(8, -(-per // 8) * 8)
    Lp = -(-L // tile) * tile
    return tile, Lp


def _weights_cast(dt, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout):
    return (
        scale.astype(dt)[:, None, :], shift.astype(dt)[:, None, :],
        gate.astype(dt)[:, None, :],
        g1.astype(dt)[None], g2.astype(dt)[None],
        dww.astype(dt), dwb.astype(dt)[None],
        wvg.astype(dt), bvg.astype(dt)[None],
        wout.astype(dt), bout.astype(dt)[None],
    )


def _fused_film_layer_fwd_impl(
    x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout,
    *, tile, interpret,
):
    B, L, C = x.shape
    K = dww.shape[0]
    radius = K // 2
    H = wout.shape[0]
    assert 2 * radius <= _HALO

    tile = feasible_fwd_tile(C, H, K, tile)
    if tile is None:
        # even the minimum tile exceeds VMEM (very wide stacks): the
        # reference path is correct at any width
        return film_layer_reference(
            x, scale, shift, gate, g1, g2,
            dww, dwb, wvg, bvg, wout, bout,
        )
    tile, Lp = _prep(x, L, tile)
    xp = jnp.pad(x, ((0, 0), (_HALO, Lp - L + _HALO), (0, 0)))

    out = pl.pallas_call(
        partial(_fwd_kernel, tile=tile, radius=radius, h_dim=H, seq_len=L),
        grid=(B, Lp // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + _film_specs(B, C, H, K),
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # canonical layer flops (vg + out matmuls + conv taps) so XLA's cost
        # analysis — the numerator of every MFU figure — counts the work
        # this kernel absorbs from the graph
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * C * (2 * H + H + K),
            bytes_accessed=2 * B * Lp * C * 2,
            transcendentals=B * Lp * H,
        ),
        interpret=interpret,
    )(xp, *_weights_cast(x.dtype, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout))
    return out[:, :L]


def _fused_film_layer_bwd_impl(
    x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout, grad_out,
    *, tile, interpret,
):
    B, L, C = x.shape
    K = dww.shape[0]
    radius = K // 2
    H = wout.shape[0]
    assert 2 * radius <= _HALO

    tile, Lp = _prep(x, L, tile)
    pad = ((0, 0), (_HALO, Lp - L + _HALO), (0, 0))
    xp = jnp.pad(x, pad)
    gop = jnp.pad(grad_out.astype(x.dtype), pad)

    f32 = jnp.float32
    const = lambda shape: pl.BlockSpec(shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM)  # noqa: E731
    per_b = lambda shape: pl.BlockSpec(shape, lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731

    outs = pl.pallas_call(
        partial(_bwd_kernel, tile=tile, radius=radius, h_dim=H, seq_len=L),
        grid=(B, Lp // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
        + _film_specs(B, C, H, K),
        out_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            per_b((1, 1, C)), per_b((1, 1, C)), per_b((1, 1, C)),  # dscale dshift dgate
            const((1, C)), const((1, C)),                    # dg1 dg2
            const((K, C)), const((1, C)),                    # ddw ddwb
            const((C, 2 * H)), const((1, 2 * H)),            # dwvg dbvg
            const((H, C)), const((1, C)),                    # dwout dbout
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((K, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, 2 * H), f32),
            jax.ShapeDtypeStruct((1, 2 * H), f32),
            jax.ShapeDtypeStruct((H, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # recompute-fwd + data grads + weight grads ≈ 3x the forward matmul
        # flops (see the fwd call's cost_estimate note)
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Lp * C * (2 * H + H + K),
            bytes_accessed=4 * B * Lp * C * 2,
            transcendentals=B * Lp * H,
        ),
        interpret=interpret,
    )(xp, gop, *_weights_cast(x.dtype, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout))

    (dx, dsc, dsh, dgt, dg1, dg2, ddw, ddwb, dwvg, dbvg, dwout, dbout) = outs
    return (
        dx[:, :L],
        dsc[:, 0].astype(scale.dtype),
        dsh[:, 0].astype(shift.dtype),
        dgt[:, 0].astype(gate.dtype),
        dg1[0].astype(g1.dtype),
        dg2[0].astype(g2.dtype),
        ddw.astype(dww.dtype),
        ddwb[0].astype(dwb.dtype),
        dwvg.astype(wvg.dtype),
        dbvg[0].astype(bvg.dtype),
        dwout.astype(wout.dtype),
        dbout[0].astype(bout.dtype),
    )


def _bwd_vmem_bytes(C: int, H: int, K: int, tile: int) -> int:
    """rough VMEM bound for the backward kernel (weights + accumulators +
    the live fp32 intermediates of one extended tile)"""
    E = tile + 2 * _HALO
    weights = 2 * (K * C + 7 * C + C * 2 * H + 2 * H + H * C)
    accums = 4 * (K * C + 8 * C + C * 2 * H + 2 * H + H * C)
    work = 4 * E * (2 * H) * 3 + 4 * E * H * 2 + 4 * E * C * 6 + 2 * E * C * 4
    return weights + accums + work


def feasible_tile(C: int, H: int, K: int, tile: int = DEFAULT_TILE) -> int | None:
    """largest backward tile that fits the shared VMEM budget
    (ops/_tiles.py), else None"""
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _bwd_vmem_bytes(C, H, K, t), tile)


def _fwd_vmem_bytes(C: int, H: int, K: int, tile: int) -> int:
    """rough VMEM bound for the forward kernel: bf16 weights (cast before
    the call) + the live bf16/fp32 intermediates of one extended tile
    (xs/h1/y/out + fp32 vg/o + the gated-FFN chain)"""
    E = tile + 2 * _HALO
    weights = 2 * (K * C + 7 * C + C * 2 * H + 2 * H + H * C)
    work = E * (12 * C + 26 * H)
    return weights + work


def feasible_fwd_tile(C: int, H: int, K: int, tile: int = DEFAULT_TILE) -> int | None:
    """largest forward tile that fits the shared VMEM budget, else None.
    The narrow production stacks (C=128/H=341) keep the full DEFAULT_TILE;
    wide stacks shrink instead of failing Mosaic allocation (the backward
    always had this via feasible_tile; the forward ran at DEFAULT_TILE
    unconditionally before)"""
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _fwd_vmem_bytes(C, H, K, t), tile)


@partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_film_layer(
    x, scale, shift, gate, g1, g2,
    dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
    tile=DEFAULT_TILE, interpret=False,
):
    """fused FiLM residual layer: (B, L, C) -> (B, L, C); film vectors are
    (B, C). ``interpret=True`` runs in the Pallas interpreter (CPU tests)."""
    return _fused_film_layer_fwd_impl(
        x, scale, shift, gate, g1, g2,
        dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
        tile=tile, interpret=interpret,
    )


def _fwd(x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout, tile, interpret):
    out = _fused_film_layer_fwd_impl(
        x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout,
        tile=tile, interpret=interpret,
    )
    return out, (x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout)


def _bwd(tile, interpret, residuals, grad_out):
    x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout = residuals
    C = x.shape[-1]
    H = wout.shape[0]
    K = dww.shape[0]
    bwd_tile = feasible_tile(C, H, K, tile)
    if bwd_tile is not None:
        return _fused_film_layer_bwd_impl(
            x, scale, shift, gate, g1, g2, dww, dwb, wvg, bvg, wout, bout,
            grad_out, tile=bwd_tile, interpret=interpret,
        )
    _, vjp = jax.vjp(film_layer_reference, *residuals)
    return vjp(grad_out)


fused_film_layer.defvjp(_fwd, _bwd)
