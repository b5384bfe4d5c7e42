"""Fused SwiGLU conv-FFN as a Pallas TPU kernel.

The SwiGLU block (depthwise conv -> [v|g] projection -> v*silu(g) ->
rms-norm -> out projection) is the FLOP workhorse of every model here (8+
layers per stack, reference common/swiglu.py semantics). Unfused, each stage
round-trips activations through HBM; this kernel runs the whole block per
L-tile out of VMEM:

  grid (B, L/tile):
    DMA x[b, t*tile : t*tile + tile + 2r] (zero halo materialized by the
        wrapper) HBM -> VMEM
    depthwise conv as 2r+1 shifted fused multiply-adds  (VPU)
    (tile, C) @ (C, 2H) gate projection                  (MXU)
    v * silu(g), fp32 rms-norm over H                    (VPU)
    (tile, H) @ (H, C) out projection                    (MXU)

Gradients: ``fused_swiglu`` carries a custom VJP whose backward recomputes
via the pure-jnp reference (`swiglu_reference`) — numerically identical
forward/backward, so the kernel is safe inside training steps.

The kernel expects all weights resident in VMEM; for the dims used here
(C<=512, H<=1536) everything fits comfortably in 16 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512


def swiglu_reference(
    x: jnp.ndarray,
    dw_kernel: jnp.ndarray | None,  # (K, C) or None
    dw_bias: jnp.ndarray | None,    # (C,)
    vg_kernel: jnp.ndarray,         # (C, 2H)
    vg_bias: jnp.ndarray,           # (2H,)
    out_kernel: jnp.ndarray,        # (H, C)
    out_bias: jnp.ndarray,          # (C,)
) -> jnp.ndarray:
    """pure-jnp reference with identical semantics (and the backward path
    of the fused kernel)"""
    if dw_kernel is not None:
        K, C = dw_kernel.shape
        r = K // 2
        xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
        acc = dw_bias.astype(x.dtype)
        y = sum(
            xp[:, k : k + x.shape[1], :] * dw_kernel[k].astype(x.dtype)
            for k in range(K)
        ) + acc
    else:
        y = x
    vg = y @ vg_kernel.astype(y.dtype) + vg_bias.astype(y.dtype)
    v, g = jnp.split(vg, 2, axis=-1)
    h = v * jax.nn.silu(g)
    hf = h.astype(jnp.float32)
    h = (hf * jax.lax.rsqrt(jnp.mean(hf * hf, axis=-1, keepdims=True) + 1e-6)).astype(x.dtype)
    return h @ out_kernel.astype(h.dtype) + out_bias.astype(h.dtype)


# front padding of the wrapper input; also the DMA halo on each side. one
# sublane (8) keeps every DMA start/size 8-aligned for any radius <= 8
_HALO = 8


def _kernel(x_hbm, dww, dwb, wvg, bvg, wout, bout, out_ref, xs, sem, *, tile, radius, h_dim):
    b = pl.program_id(0)
    t = pl.program_id(1)
    K = 2 * radius + 1

    # window [t*tile, t*tile + tile + 2*_HALO) of the front-padded input:
    # position l of this tile sits at xs[_HALO + l]
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], xs, sem
    )
    copy.start()
    copy.wait()

    # depthwise conv: K shifted FMAs over the haloed tile
    base = _HALO - radius
    y = xs[_HALO : _HALO + tile, :] * dww[radius, :]
    for k in range(K):
        if k != radius:
            y += xs[base + k : base + k + tile, :] * dww[k, :]
    y += dwb[0, :]

    vg = jnp.dot(y, wvg[:, :], preferred_element_type=jnp.float32)
    vg += bvg[0, :].astype(jnp.float32)
    v = vg[:, :h_dim]
    g = vg[:, h_dim:]
    h = v * (g * jax.nn.sigmoid(g))  # silu in fp32
    h = h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + 1e-6)

    out = jnp.dot(h.astype(out_ref.dtype), wout[:, :], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = (out + bout[0, :].astype(jnp.float32)).astype(out_ref.dtype)


def _fwd_vmem_bytes(C: int, H: int, K: int, tile: int) -> int:
    """VMEM footprint of the forward kernel: resident weights + one tile's
    f32 intermediates + input scratch/output blocks"""
    E = tile + 2 * _HALO
    weights = 2 * (K * C + C + C * 2 * H + 2 * H + H * C)
    work = 4 * E * 2 * H + 4 * E * H + 4 * E * C + 2 * E * C * 3
    return weights + work


def _fused_swiglu_fwd_impl(x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias, *, tile, interpret):
    B, L, C = x.shape
    K, _ = dw_kernel.shape
    radius = K // 2
    H = out_kernel.shape[0]

    assert radius <= _HALO, f"radius {radius} exceeds kernel halo {_HALO}"
    from ._tiles import shrink_tile_to_budget

    tile = shrink_tile_to_budget(lambda t: _fwd_vmem_bytes(C, H, K, t), tile)
    if tile is None:
        # no tile fits (resident weights alone can exceed the budget at
        # very wide dims): the unfused path is correct at any width
        return swiglu_reference(
            x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias
        )
    n_tiles = max(1, -(-L // max(8, tile)))
    tile = max(8, -(--(-L // n_tiles) // 8) * 8)  # balanced sublane-aligned tiles
    Lp = -(-L // tile) * tile
    # front pad _HALO, back pad to Lp + _HALO: every DMA window is in-bounds
    xp = jnp.pad(x, ((0, 0), (_HALO, Lp - L + _HALO), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, tile=tile, radius=radius, h_dim=H),
        grid=(B, Lp // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM, DMA'd per tile
            pl.BlockSpec((K, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # canonical block flops (vg + out matmuls + conv taps) so XLA cost
        # analysis — every MFU numerator — counts the absorbed work
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * C * (3 * H + K),
            bytes_accessed=2 * B * Lp * C * 2,
            transcendentals=B * Lp * H,
        ),
        interpret=interpret,
    )(
        xp,
        dw_kernel.astype(x.dtype),
        dw_bias.astype(x.dtype)[None],
        vg_kernel.astype(x.dtype),
        vg_bias.astype(x.dtype)[None],
        out_kernel.astype(x.dtype),
        out_bias.astype(x.dtype)[None],
    )
    return out[:, :L]


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_swiglu(x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias, tile=DEFAULT_TILE, interpret=False):
    """fused SwiGLU block: (B, L, C) -> (B, L, C). `interpret=True` runs the
    kernel in the Pallas interpreter (CPU testing)."""
    return _fused_swiglu_fwd_impl(
        x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
        tile=tile, interpret=interpret,
    )


def _fwd(x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias, tile, interpret):
    out = _fused_swiglu_fwd_impl(
        x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias,
        tile=tile, interpret=interpret,
    )
    return out, (x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias)


def _bwd_kernel(
    x_hbm, go_hbm, dww, dwb, wvg, bvg, wout,
    dx_ref, ddw_ref, ddwb_ref, dwvg_ref, dbvg_ref, dwout_ref, dbout_ref,
    xs, gos, sem_x, sem_g, *, tile, radius, h_dim,
):
    """flash-style backward: recompute the forward per tile out of VMEM,
    emit dx for the tile, and accumulate all weight/bias grads in fp32
    output blocks that stay VMEM-resident across the (sequential) TPU grid.

    dY at a position needs only that position's recomputed intermediates,
    but dx mixes dY across the conv taps — so the recompute runs on an
    r-extended region and weight grads accumulate over the core rows only
    (halo rows belong to the neighboring tiles' programs).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    K = 2 * radius + 1
    r = radius
    E = tile + 2 * r  # extended region: tile plus one conv halo each side

    cp_x = pltpu.make_async_copy(x_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], xs, sem_x)
    cp_g = pltpu.make_async_copy(go_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], gos, sem_g)
    cp_x.start()
    cp_g.start()

    @pl.when((b == 0) & (t == 0))
    def _zero_accums():
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddwb_ref[...] = jnp.zeros_like(ddwb_ref)
        dwvg_ref[...] = jnp.zeros_like(dwvg_ref)
        dbvg_ref[...] = jnp.zeros_like(dbvg_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    cp_x.wait()
    cp_g.wait()

    f32 = jnp.float32

    # ---- recompute the forward on the extended region (bit-matches _kernel)
    # y_ext[e] = sum_k x[t*tile - r + e + k - r] w[k]: xs row (_HALO-2r)+e+k
    base = _HALO - 2 * r
    y = xs[base + r : base + r + E, :] * dww[r, :]
    for k in range(K):
        if k != r:
            y += xs[base + k : base + k + E, :] * dww[k, :]
    y += dwb[0, :]

    vg = jnp.dot(y, wvg[:, :], preferred_element_type=f32)
    vg += bvg[0, :].astype(f32)
    v = vg[:, :h_dim]
    g = vg[:, h_dim:]
    sig = jax.nn.sigmoid(g)
    sil = g * sig
    spre = v * sil                                     # pre-norm gated value
    mean_sq = jnp.mean(spre * spre, axis=-1, keepdims=True)
    n = jax.lax.rsqrt(mean_sq + 1e-6)
    hn = spre * n

    # ---- backward chain (per position, fp32 stats)
    dout = gos[_HALO - r : _HALO - r + E, :]           # grad at block output
    dhn = jax.lax.dot_general(
        dout, wout[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                  # (E, H)
    # rms-norm backward: dspre = n*dhn - n^3 * spre * mean(dhn*spre)
    dspre = n * dhn - (n * n * n) * spre * jnp.mean(dhn * spre, axis=-1, keepdims=True)
    dv = dspre * sil
    dg = dspre * v * (sig * (1.0 + g * (1.0 - sig)))   # d silu(g)
    dvg = jnp.concatenate([dv, dg], axis=-1).astype(y.dtype)
    dY = jax.lax.dot_general(
        dvg, wvg[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                  # (E, C)

    # ---- dx for the core tile: transpose conv over dY
    # dx[q] = sum_k dY[q - k + r] w[k]; dY row of position q+r-k is l+2r-k
    dx = dY[2 * r : 2 * r + tile, :] * dww[0, :].astype(f32)
    for k in range(1, K):
        dx += dY[2 * r - k : 2 * r - k + tile, :] * dww[k, :].astype(f32)
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)

    # ---- weight/bias grads over core rows only (halo rows are owned by the
    # neighboring tiles — padded tail rows contribute zero because go is
    # zero there, hence dY/dvg/dout vanish)
    core = slice(r, r + tile)
    dout_c = dout[core, :]
    hn_c = hn[core, :].astype(y.dtype)
    y_c = y[core, :]
    dvg_c = dvg[core, :]
    dY_c = dY[core, :]

    dwout_ref[...] += jax.lax.dot_general(
        hn_c, dout_c, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    dbout_ref[0, :] += jnp.sum(dout_c.astype(f32), axis=0)
    dwvg_ref[...] += jax.lax.dot_general(
        y_c, dvg_c, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )
    dbvg_ref[0, :] += jnp.sum(dvg_c.astype(f32), axis=0)
    # ddw[k] = sum_p dY[p] * x[p + k - r]: xs row _HALO + (e - r) + k - r
    for k in range(K):
        xk = xs[base + k + r : base + k + r + tile, :]
        ddw_ref[k, :] += jnp.sum(dY_c * xk.astype(f32), axis=0)
    ddwb_ref[0, :] += jnp.sum(dY_c, axis=0)


def _fused_swiglu_bwd_impl(x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, grad_out, *, tile, interpret):
    B, L, C = x.shape
    K, _ = dw_kernel.shape
    radius = K // 2
    H = out_kernel.shape[0]

    assert 2 * radius <= _HALO, f"2*radius {2 * radius} exceeds kernel halo {_HALO}"
    n_tiles = max(1, -(-L // max(8, tile)))
    tile = max(8, -(--(-L // n_tiles) // 8) * 8)
    Lp = -(-L // tile) * tile
    pad = ((0, 0), (_HALO, Lp - L + _HALO), (0, 0))
    xp = jnp.pad(x, pad)
    gop = jnp.pad(grad_out.astype(x.dtype), pad)

    f32 = jnp.float32
    outs = pl.pallas_call(
        partial(_bwd_kernel, tile=tile, radius=radius, h_dim=H),
        grid=(B, Lp // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((K, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * H), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, C), x.dtype),       # dx
            jax.ShapeDtypeStruct((K, C), f32),               # d dw_kernel
            jax.ShapeDtypeStruct((1, C), f32),               # d dw_bias
            jax.ShapeDtypeStruct((C, 2 * H), f32),           # d vg_kernel
            jax.ShapeDtypeStruct((1, 2 * H), f32),           # d vg_bias
            jax.ShapeDtypeStruct((H, C), f32),               # d out_kernel
            jax.ShapeDtypeStruct((1, C), f32),               # d out_bias
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # recompute-fwd + data grads + weight grads ≈ 3x the forward flops
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Lp * C * (3 * H + K),
            bytes_accessed=4 * B * Lp * C * 2,
            transcendentals=B * Lp * H,
        ),
        interpret=interpret,
    )(
        xp,
        gop,
        dw_kernel.astype(x.dtype),
        dw_bias.astype(x.dtype)[None],
        vg_kernel.astype(x.dtype),
        vg_bias.astype(x.dtype)[None],
        out_kernel.astype(x.dtype),
    )
    dx, ddw, ddwb, dwvg, dbvg, dwout, dbout = outs
    return (
        dx[:, :L],
        ddw.astype(dw_kernel.dtype),
        ddwb[0].astype(dw_bias.dtype),
        dwvg.astype(vg_kernel.dtype),
        dbvg[0].astype(vg_bias.dtype),
        dwout.astype(out_kernel.dtype),
        dbout[0].astype(out_kernel.dtype),
    )


def _partial_bwd_kernel(
    x_hbm, go_hbm, dww, dwb, wvg, bvg, wout,
    dx_ref, dvg_ref, hn_ref, y_ref, ddw_ref, ddwb_ref, dbvg_ref, dbout_ref,
    xs, gos, sem_x, sem_g, *, tile, radius, h_dim,
):
    """partial flash-style backward for dims whose full weight-grad
    accumulators don't fit VMEM (the denoiser FFN: C=512, H=1365 needs
    ~8.4 MiB of f32 accumulators on top of the weights).

    Emits dx plus the three intermediates XLA needs for the two big weight
    matmuls — dvg, hn and the recomputed conv output y — and accumulates
    only the SMALL grads (conv taps + biases) in VMEM. The elementwise
    chain (silu/rms-norm backward) and both data-gradient matmuls stay
    fused; dW_vg = y^T dvg and dW_out = hn^T dout run as two ordinary XLA
    matmuls afterwards (they were at 75%+ MXU efficiency unfused anyway).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    K = 2 * radius + 1
    r = radius
    E = tile + 2 * r

    cp_x = pltpu.make_async_copy(x_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], xs, sem_x)
    cp_g = pltpu.make_async_copy(go_hbm.at[b, pl.ds(t * tile, tile + 2 * _HALO)], gos, sem_g)
    cp_x.start()
    cp_g.start()

    @pl.when((b == 0) & (t == 0))
    def _zero_accums():
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        ddwb_ref[...] = jnp.zeros_like(ddwb_ref)
        dbvg_ref[...] = jnp.zeros_like(dbvg_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    cp_x.wait()
    cp_g.wait()

    f32 = jnp.float32

    # ---- recompute the forward on the extended region (bit-matches _kernel)
    base = _HALO - 2 * r
    y = xs[base + r : base + r + E, :] * dww[r, :]
    for k in range(K):
        if k != r:
            y += xs[base + k : base + k + E, :] * dww[k, :]
    y += dwb[0, :]

    vg = jnp.dot(y, wvg[:, :], preferred_element_type=f32)
    vg += bvg[0, :].astype(f32)
    v = vg[:, :h_dim]
    g = vg[:, h_dim:]
    sig = jax.nn.sigmoid(g)
    sil = g * sig
    spre = v * sil
    mean_sq = jnp.mean(spre * spre, axis=-1, keepdims=True)
    n = jax.lax.rsqrt(mean_sq + 1e-6)
    hn = spre * n

    # ---- backward chain
    dout = gos[_HALO - r : _HALO - r + E, :]
    dhn = jax.lax.dot_general(
        dout, wout[:, :], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )
    dspre = n * dhn - (n * n * n) * spre * jnp.mean(dhn * spre, axis=-1, keepdims=True)
    dv = dspre * sil
    dg = dspre * v * (sig * (1.0 + g * (1.0 - sig)))
    dvg = jnp.concatenate([dv, dg], axis=-1).astype(y.dtype)
    dY = jax.lax.dot_general(
        dvg, wvg[:, :], (((1,), (1,)), ((), ())), preferred_element_type=f32,
    )

    dx = dY[2 * r : 2 * r + tile, :] * dww[0, :].astype(f32)
    for k in range(1, K):
        dx += dY[2 * r - k : 2 * r - k + tile, :] * dww[k, :].astype(f32)
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)

    # ---- core rows out to HBM for the XLA weight matmuls
    core = slice(r, r + tile)
    dvg_c = dvg[core, :]
    dY_c = dY[core, :]
    dvg_ref[0, :, :] = dvg_c
    hn_ref[0, :, :] = hn[core, :].astype(hn_ref.dtype)
    y_ref[0, :, :] = y[core, :]

    # ---- small grads accumulate in VMEM
    dbout_ref[0, :] += jnp.sum(dout[core, :].astype(f32), axis=0)
    dbvg_ref[0, :] += jnp.sum(dvg_c.astype(f32), axis=0)
    for k in range(K):
        xk = xs[base + k + r : base + k + r + tile, :]
        ddw_ref[k, :] += jnp.sum(dY_c * xk.astype(f32), axis=0)
    ddwb_ref[0, :] += jnp.sum(dY_c, axis=0)


def _fused_swiglu_partial_bwd_impl(
    x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, grad_out,
    *, tile, interpret,
):
    """-> (dx, ddw, ddwb, dwvg, dbvg, dwout, dbout) with the two big weight
    matmuls computed by XLA from kernel-emitted dvg/hn/y"""
    B, L, C = x.shape
    K, _ = dw_kernel.shape
    radius = K // 2
    H = out_kernel.shape[0]

    assert 2 * radius <= _HALO, f"2*radius {2 * radius} exceeds kernel halo {_HALO}"
    n_tiles = max(1, -(-L // max(8, tile)))
    tile = max(8, -(--(-L // n_tiles) // 8) * 8)
    Lp = -(-L // tile) * tile
    pad = ((0, 0), (_HALO, Lp - L + _HALO), (0, 0))
    xp = jnp.pad(x, pad)
    gop = jnp.pad(grad_out.astype(x.dtype), pad)

    f32 = jnp.float32
    const = lambda shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((1, tile, w), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_partial_bwd_kernel, tile=tile, radius=radius, h_dim=H),
        grid=(B, Lp // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            const((K, C)), const((1, C)), const((C, 2 * H)), const((1, 2 * H)),
            const((H, C)),
        ],
        out_specs=[
            row(C), row(2 * H), row(H), row(C),
            const((K, C)), const((1, C)), const((1, 2 * H)), const((1, C)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, C), x.dtype),       # dx
            jax.ShapeDtypeStruct((B, Lp, 2 * H), x.dtype),   # dvg
            jax.ShapeDtypeStruct((B, Lp, H), x.dtype),       # hn
            jax.ShapeDtypeStruct((B, Lp, C), x.dtype),       # y (post-conv)
            jax.ShapeDtypeStruct((K, C), f32),               # d dw_kernel
            jax.ShapeDtypeStruct((1, C), f32),               # d dw_bias
            jax.ShapeDtypeStruct((1, 2 * H), f32),           # d vg_bias
            jax.ShapeDtypeStruct((1, C), f32),               # d out_bias
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.VMEM((tile + 2 * _HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # recompute-fwd + data grads (weight matmuls run in XLA afterwards)
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Lp * C * (3 * H + K),
            bytes_accessed=6 * B * Lp * C * 2,
            transcendentals=B * Lp * H,
        ),
        interpret=interpret,
    )(
        xp,
        gop,
        dw_kernel.astype(x.dtype),
        dw_bias.astype(x.dtype)[None],
        vg_kernel.astype(x.dtype),
        vg_bias.astype(x.dtype)[None],
        out_kernel.astype(x.dtype),
    )
    dx, dvg, hn, y, ddw, ddwb, dbvg, dbout = outs
    dx, dvg, hn, y = dx[:, :L], dvg[:, :L], hn[:, :L], y[:, :L]
    # the two big weight grads as plain XLA matmuls over (B, L)
    dims = (((0, 1), (0, 1)), ((), ()))
    dwvg = jax.lax.dot_general(y, dvg, dims, preferred_element_type=f32)
    go = grad_out.astype(x.dtype)
    dwout = jax.lax.dot_general(hn, go, dims, preferred_element_type=f32)
    return (
        dx,
        ddw.astype(dw_kernel.dtype),
        ddwb[0].astype(dw_bias.dtype),
        dwvg.astype(vg_kernel.dtype),
        dbvg[0].astype(vg_bias.dtype),
        dwout.astype(out_kernel.dtype),
        dbout[0].astype(out_kernel.dtype),
    )


def _partial_bwd_vmem_bytes(C: int, H: int, K: int, tile: int) -> int:
    """VMEM footprint of the partial backward: weights + small accumulators
    + one tile's f32 intermediates + the emitted row blocks"""
    E = tile + 2 * _HALO
    weights = 2 * (K * C + C + C * 2 * H + 2 * H + H * C)
    accums = 4 * (K * C + C + 2 * H + C)
    work = 4 * E * (2 * H) * 2 + 4 * E * H * 3 + 4 * E * C * 2 + 2 * E * C * 2
    emit = 2 * tile * (2 * H + H + C) * 2  # dvg/hn/y blocks, double-buffered
    return weights + accums + work + emit


def _feasible_partial_tile(C: int, H: int, K: int, tile: int) -> int | None:
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _partial_bwd_vmem_bytes(C, H, K, t), tile)


def _bwd_vmem_bytes(C: int, H: int, K: int, tile: int) -> int:
    """rough VMEM footprint of the backward kernel: resident weights +
    accumulators + the big fp32 intermediates of one tile"""
    E = tile + 2 * _HALO
    weights = 2 * (K * C + C + C * 2 * H + 2 * H + H * C)
    accums = 4 * (K * C + C + C * 2 * H + 2 * H + H * C + C)
    work = 4 * E * (2 * H) * 3 + 4 * E * H * 2 + 4 * E * C * 2 + 2 * E * C * 2
    return weights + accums + work


def _feasible_bwd_tile(C: int, H: int, K: int, tile: int) -> int | None:
    """largest tile <= ``tile`` whose backward working set fits the shared
    VMEM budget (ops/_tiles.py), or None if even the smallest tile cannot
    fit (huge H)"""
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _bwd_vmem_bytes(C, H, K, t), tile)


def bwd_kernel_feasible(C: int, H: int, K: int, tile: int = DEFAULT_TILE) -> bool:
    """whether the FULL-accumulator flash backward will engage for these
    dims (callers gate the training-path fused dispatch on this so a
    fwd-only win is never eaten by a slower backward).

    Deliberately does NOT count the partial backward: at the denoiser FFN's
    dims (C=512, H=1365) the partial path was measured SLOWER than pure XLA
    on v5e (69.1 vs 59.4 ms denoiser train step) — the block is
    matmul-bound there and XLA's full-batch (B*L)-row weight/data matmuls
    run at 75-90% MXU efficiency, which the VMEM-constrained tile-128
    in-kernel matmuls cannot match. The partial kernel remains the backward
    for explicit ``fused_swiglu`` calls at such dims (faster than the
    recompute-through-reference fallback), but the training auto-dispatch
    keeps the XLA path."""
    return _feasible_bwd_tile(C, H, K, tile) is not None


def _bwd(tile, interpret, residuals, grad_out):
    x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias = residuals
    if dw_kernel is not None:
        C = x.shape[-1]
        H = out_kernel.shape[0]
        K = dw_kernel.shape[0]
        bwd_tile = _feasible_bwd_tile(C, H, K, tile)
        if bwd_tile is not None:
            dx, ddw, ddwb, dwvg, dbvg, dwout, dbout = _fused_swiglu_bwd_impl(
                x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel,
                grad_out, tile=bwd_tile, interpret=interpret,
            )
            return dx, ddw, ddwb, dwvg, dbvg, dwout, dbout
        partial_tile = _feasible_partial_tile(C, H, K, tile)
        if partial_tile is not None:
            return _fused_swiglu_partial_bwd_impl(
                x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel,
                grad_out, tile=partial_tile, interpret=interpret,
            )
    # no depthwise conv (radius 0) or VMEM-infeasible dims: recompute-based
    # backward through the jnp reference (numerically identical forward)
    _, vjp = jax.vjp(swiglu_reference, *residuals)
    return vjp(grad_out)


fused_swiglu.defvjp(_fwd, _bwd)
