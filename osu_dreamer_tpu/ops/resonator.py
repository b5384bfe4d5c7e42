"""One-pass Pallas kernel for the resonator-bank recurrence.

The XLA path (audio/spectrogram.py) computes per-frame contributions with a
matmul and chains them with ``lax.associative_scan`` — log2(K) separate
passes over the (K, F, 2) state tensor in HBM. This kernel does the whole
thing in ONE pass over the frames:

  grid (K / TILE,), executed sequentially on the core:
    X_tile (TILE, HOP) @ W (HOP, 2F)             frame contributions   (MXU)
    Hillis-Steele prefix scan over the tile      log2(TILE) vector steps
      p[i] <- p[i] + A^d * p[i-d]                (complex mul by constants)
    cross-tile carry via VMEM scratch            states[i] += A^(i+1) * carry

Layout: complex state as [re | im] concatenated on the lane axis (2F = 144).
Per-bin complex constants enter as (2, F) tables (A^d for each doubling
level, A^(i+1) rows for the carry application).

Equals the sequential IIR to fp32 accuracy (tests/test_ops.py) and replaces
the associative-scan stage on TPU backends.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _complex_mul(vals: jnp.ndarray, cr: jnp.ndarray, ci: jnp.ndarray, F: int) -> jnp.ndarray:
    """elementwise complex multiply on [re | im] lane-concat layout.
    vals: (..., 2F); cr/ci: broadcastable (..., F) real/imag of the constant"""
    re, im = vals[..., :F], vals[..., F:]
    return jnp.concatenate([re * cr - im * ci, re * ci + im * cr], axis=-1)


@lru_cache(maxsize=4)
def _tables(hop: int, n_bins: int, sr: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W, levels, powers):
    W       (hop, 2F)        contribution weights (re | im)
    levels  (n_levels, 2, F) A^(2^k) per doubling level (re, im)
    powers  (TILE, 2, F)     A^(i+1) for each row of a tile (re, im)
    """
    from osu_dreamer_tpu.audio.constants import resonator_freqs
    from osu_dreamer_tpu.audio.spectrogram import resonator_alphas

    freqs = resonator_freqs().astype(np.float64)
    alpha = resonator_alphas(freqs)
    b = (1.0 - alpha) * np.exp(1j * 2.0 * np.pi * freqs / sr)

    j = np.arange(hop)
    w = alpha[None, :] * b[None, :] ** (hop - 1 - j)[:, None]  # (hop, F)
    W = np.concatenate([w.real, w.imag], axis=1).astype(np.float32)

    bH = b**hop
    n_levels = int(np.log2(TILE))
    levels = np.stack(
        [
            np.stack([(bH ** (1 << k)).real, (bH ** (1 << k)).imag])
            for k in range(n_levels)
        ]
    ).astype(np.float32)  # (n_levels, 2, F)

    pw = bH ** (np.arange(TILE) + 1)[:, None]  # (TILE, F)
    powers = np.stack([pw.real, pw.imag], axis=1).astype(np.float32)  # (TILE, 2, F)

    return W, levels, powers


def _kernel(x_ref, w_ref, lv_ref, pw_ref, out_ref, carry, *, n_bins):
    t = pl.program_id(0)
    F = n_bins
    n_levels = lv_ref.shape[0]

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    # frame contributions on the MXU
    p = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)

    # Hillis-Steele inclusive prefix scan with constant per-bin ratio A
    for k in range(n_levels):
        d = 1 << k
        shifted = jnp.pad(p, ((d, 0), (0, 0)))[:TILE]
        p = p + _complex_mul(shifted, lv_ref[k, 0, :], lv_ref[k, 1, :], F)

    # inject the carry from previous tiles: states[i] += A^(i+1) * carry
    c = carry[0:1, :]  # (1, 2F)
    states = p + _complex_mul(
        jnp.broadcast_to(c, (TILE, 2 * F)), pw_ref[:, 0, :], pw_ref[:, 1, :], F
    )

    carry[0:1, :] = states[TILE - 1 : TILE, :]
    out_ref[...] = states


def resonate_frames_pallas(
    frames: jnp.ndarray, hop: int, n_bins: int, sr: int, interpret: bool = False
) -> jnp.ndarray:
    """(K, hop) float32 frame matrix -> (K, F, 2) resonator states at frame
    boundaries (same contract as audio.spectrogram._resonate_frames)"""
    K = frames.shape[0]
    Kp = -(-K // TILE) * TILE
    if Kp != K:
        frames = jnp.pad(frames, ((0, Kp - K), (0, 0)))

    W, levels, powers = _tables(hop, n_bins, sr)

    out = pl.pallas_call(
        partial(_kernel, n_bins=n_bins),
        grid=(Kp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, hop), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(W.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(levels.shape, lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(powers.shape, lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 2 * n_bins), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, 2 * n_bins), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2 * n_bins), jnp.float32)],
        interpret=interpret,
    )(frames, jnp.asarray(W), jnp.asarray(levels), jnp.asarray(powers))

    return jnp.stack([out[:K, :n_bins], out[:K, n_bins:]], axis=-1)
