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


def _fused_swiglu_fwd_impl(x, dw_kernel, dw_bias, vg_kernel, vg_bias, out_kernel, out_bias, *, tile, interpret):
    B, L, C = x.shape
    K, _ = dw_kernel.shape
    radius = K // 2
    H = out_kernel.shape[0]

    assert radius <= _HALO, f"radius {radius} exceeds kernel halo {_HALO}"
    tile = max(8, -(-min(tile, L) // 8) * 8)  # sublane-aligned tile
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


def _bwd(tile, interpret, residuals, grad_out):
    # recompute-based backward through the jnp reference: XLA fuses this well
    # and it is numerically identical to the kernel's forward
    _, vjp = jax.vjp(swiglu_reference, *residuals)
    return vjp(grad_out)


fused_swiglu.defvjp(_fwd, _bwd)
