"""Fused norm + FiLM + qkv-projection prologue as Pallas TPU kernels.

One denoiser BackboneLayer prologue (models/diffusion/model.py, reference
models/diffusion/backbone.py:52-70) is, per position:

    y   = rms_norm(x) * (1 + scale) + shift + add     # FiLM + audio inject
    qkv = y @ W + b                                   # packed projection

Under XLA this is a fused elementwise chain plus a full-batch matmul — one
extra HBM round trip of the (B, L, C) activation between them. These
kernels run the whole prologue per L-tile out of VMEM:

- forward: one (B, L, C) read (+ the add stream) + one (B, L, F) write;
- backward: flash-style — recompute y per tile, emit dx/dadd directly and
  accumulate dW/db (fp32) and the per-batch-row film grads across the
  sequential TPU grid. No forward residuals are saved beyond the inputs.

Semantics are validated against ``film_qkv_reference`` (the exact jnp
composition BackboneLayer otherwise runs) in tests/test_ops.py.

Dispatch is OPT-IN: nn/attention.py routes here only when
``OSU_DREAMER_FUSED_PROLOGUE=1`` is set (and the footprint fits VMEM).
Slope-timed measurement at the denoiser train shape (B128 L152 C512->3072,
benchmarks/half_layer_probe.json) shows the XLA chain FASTER than this
kernel once dispatch overhead is excluded (0.88 vs 0.80 effective MXU) —
XLA already fuses the elementwise prologue into the matmul well at that
shape. The kernel stays available for A/B runs and shapes where the fusion
may win.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# starting tile for the VMEM-budget shrink search (ops/_tiles.py); the
# denoiser train shape (L=152) lands on a single 152-row tile per batch row
DEFAULT_TILE = 512


def film_qkv_reference(
    x: jnp.ndarray,       # (B, L, C)
    scale: jnp.ndarray,   # (B, C)
    shift: jnp.ndarray,   # (B, C)
    add: jnp.ndarray,     # (B, L, C) injected stream (audio projection)
    kernel: jnp.ndarray,  # (C, F)
    bias: jnp.ndarray,    # (F,)
) -> jnp.ndarray:
    """pure-jnp reference with identical semantics (and the fallback path);
    bit-matches the unfused BackboneLayer prologue"""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    y = (xf * inv).astype(dt) * (1 + scale[:, None, :].astype(dt))
    y = y + shift[:, None, :].astype(dt) + add.astype(dt)
    return y @ kernel.astype(dt) + bias.astype(dt)


# --------------------------------------------------------------- forward ----


def _fwd_kernel(x_ref, add_ref, sc_ref, sh_ref, w_ref, b_ref, o_ref):
    f32 = jnp.float32
    dt = x_ref.dtype
    xf = x_ref[0].astype(f32)  # (T, C)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    y = (xf * inv).astype(dt) * (1 + sc_ref[0, 0, :]) + sh_ref[0, 0, :]
    y = y + add_ref[0]
    o_ref[0] = (
        jnp.dot(y, w_ref[...], preferred_element_type=f32)
        + b_ref[0, :].astype(f32)
    ).astype(o_ref.dtype)


def _prep(L: int, tile: int) -> tuple[int, int]:
    """balanced 8-aligned tiles: split L into the number of tiles the cap
    implies, each just big enough (mirrors ops/film_layer.py _prep)"""
    n = max(1, -(-L // max(8, tile)))
    per = -(-L // n)
    tile = max(8, -(-per // 8) * 8)
    return tile, -(-L // tile) * tile


def _fwd_vmem_bytes(C: int, F: int, tile: int) -> int:
    """bf16 weights + one tile's live set (x/add/y bf16, fp32 stats chain,
    fp32 matmul accumulator + bf16 out)"""
    weights = 2 * (C * F + F)
    work = tile * (10 * C + 6 * F)
    return weights + work


def feasible_fwd_tile(C: int, F: int, tile: int = DEFAULT_TILE) -> int | None:
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _fwd_vmem_bytes(C, F, t), tile)


def _film_rows(scale, shift, dt):
    # film rows travel as (B, 1, C): a (1, C) block of a (B, C) array
    # violates Mosaic's second-minor tiling (ops/film_layer.py _film_specs)
    return scale.astype(dt)[:, None, :], shift.astype(dt)[:, None, :]


def _fwd_impl(x, scale, shift, add, kernel, bias, *, tile, interpret):
    B, L, C = x.shape
    F = kernel.shape[1]
    tile = feasible_fwd_tile(C, F, tile)
    if tile is None:
        return film_qkv_reference(x, scale, shift, add, kernel, bias)
    tile, Lp = _prep(L, tile)
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        x = jnp.pad(x, pad)
        add = jnp.pad(add, pad)

    dt = x.dtype
    sc, sh = _film_rows(scale, shift, dt)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, Lp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, F), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Lp, F), dt),
        # projection flops so XLA's cost analysis — the numerator of every
        # MFU figure — counts the work this kernel absorbs from the graph
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * C * F,
            bytes_accessed=2 * B * Lp * (2 * C + F),
            transcendentals=B * Lp,
        ),
        interpret=interpret,
    )(x, add.astype(dt), sc, sh, kernel.astype(dt), bias.astype(dt)[None])
    return out[:, :L]


# -------------------------------------------------------------- backward ----


def _bwd_kernel(
    x_ref, add_ref, g_ref, sc_ref, sh_ref, w_ref,
    dx_ref, dadd_ref, dsc_ref, dsh_ref, dw_ref, db_ref,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    dt = x_ref.dtype

    @pl.when(t == 0)
    def _zero_film_accums():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dsh_ref[...] = jnp.zeros_like(dsh_ref)

    @pl.when((b == 0) & (t == 0))
    def _zero_global_accums():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # recompute the forward's y (padded rows carry shift, but their grad
    # rows are zero-padded so every accumulated contribution vanishes)
    xf = x_ref[0].astype(f32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
    xn = xf * inv                                  # (T, C) fp32
    one_sc = 1 + sc_ref[0, 0, :].astype(f32)
    y = (xn.astype(dt) * one_sc.astype(dt) + sh_ref[0, 0, :]) + add_ref[0]

    g = g_ref[0]                                   # (T, F) bf16
    dw_ref[...] += jax.lax.dot_general(
        y, g, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    db_ref[0, :] += jnp.sum(g.astype(f32), axis=0)

    dy = jax.lax.dot_general(
        g, w_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=f32
    )                                              # (T, C) fp32
    dadd_ref[0] = dy.astype(dadd_ref.dtype)
    dsh_ref[0, 0, :] += jnp.sum(dy, axis=0)
    dsc_ref[0, 0, :] += jnp.sum(dy * xn, axis=0)

    dxn = dy * one_sc
    dx = inv * dxn - (inv * inv * inv) * xf * jnp.mean(
        dxn * xf, axis=-1, keepdims=True
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_vmem_bytes(C: int, F: int, tile: int) -> int:
    weights = 2 * (C * F)
    accums = 4 * (C * F + F + 2 * C)
    work = tile * (18 * C + 6 * F)
    return weights + accums + work


def feasible_bwd_tile(C: int, F: int, tile: int = DEFAULT_TILE) -> int | None:
    from ._tiles import shrink_tile_to_budget

    return shrink_tile_to_budget(lambda t: _bwd_vmem_bytes(C, F, t), tile)


def _bwd_impl(x, scale, shift, add, kernel, grad_out, *, tile, interpret):
    B, L, C = x.shape
    F = kernel.shape[1]
    tile, Lp = _prep(L, tile)
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        x = jnp.pad(x, pad)
        add = jnp.pad(add, pad)
        grad_out = jnp.pad(grad_out, pad)

    dt = x.dtype
    f32 = jnp.float32
    sc, sh = _film_rows(scale, shift, dt)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    tile_bt = lambda w: pl.BlockSpec(  # noqa: E731
        (1, tile, w), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(B, Lp // tile),
        in_specs=[
            tile_bt(C), tile_bt(C), tile_bt(F),
            per_b((1, 1, C)), per_b((1, 1, C)),
            const((C, F)),
        ],
        out_specs=[
            tile_bt(C), tile_bt(C),
            per_b((1, 1, C)), per_b((1, 1, C)),
            const((C, F)), const((1, F)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lp, C), dt),
            jax.ShapeDtypeStruct((B, Lp, C), dt),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
            jax.ShapeDtypeStruct((C, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
        ],
        # recompute-y + the two grad matmuls ~ 3x the forward flops
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Lp * C * F,
            bytes_accessed=2 * B * Lp * (4 * C + F),
            transcendentals=B * Lp,
        ),
        interpret=interpret,
    )(
        x, add.astype(dt), grad_out.astype(dt), sc, sh, kernel.astype(dt),
    )
    dx, dadd, dsc, dsh, dw, db = outs
    return dx[:, :L], dadd[:, :L], dsc[:, 0], dsh[:, 0], dw, db[0]


# ------------------------------------------------------------- wrappers -----


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def film_qkv(
    x, scale, shift, add, kernel, bias, tile=DEFAULT_TILE, interpret=False
):
    """fused prologue: (B, L, C) -> (B, L, F) packed projection of
    ``rms_norm(x) * (1 + scale) + shift + add``; film vectors are (B, C).
    ``interpret=True`` runs in the Pallas interpreter (CPU tests)."""
    return _fwd_impl(x, scale, shift, add, kernel, bias, tile=tile, interpret=interpret)


def _vjp_fwd(x, scale, shift, add, kernel, bias, tile, interpret):
    out = _fwd_impl(x, scale, shift, add, kernel, bias, tile=tile, interpret=interpret)
    return out, (x, scale, shift, add, kernel, bias)


def _vjp_bwd(tile, interpret, residuals, grad_out):
    x, scale, shift, add, kernel, bias = residuals
    C = x.shape[-1]
    F = kernel.shape[1]
    bwd_tile = feasible_bwd_tile(C, F, tile)
    if bwd_tile is not None:
        dx, dadd, dsc, dsh, dw, db = _bwd_impl(
            x, scale, shift, add, kernel, grad_out,
            tile=bwd_tile, interpret=interpret,
        )
    else:
        _, vjp = jax.vjp(film_qkv_reference, x, scale, shift, add, kernel, bias)
        dx, dsc, dsh, dadd, dw, db = vjp(grad_out)
        return (dx, dsc, dsh, dadd, dw, db)
    return (
        dx,
        dsc.astype(scale.dtype),
        dsh.astype(shift.dtype),
        dadd.astype(add.dtype),
        dw.astype(kernel.dtype),
        db.astype(bias.dtype),
    )


film_qkv.defvjp(_vjp_fwd, _vjp_bwd)
