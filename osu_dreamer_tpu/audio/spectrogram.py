r"""Resonator-bank spectrogram featurizer, TPU-native.

The reference computes a constant-Q-like spectrogram with a bank of 72 complex
one-pole resonators applied sample-by-sample at 16384 Hz (the ``resonators``
Rust crate, reference data/load_audio.py:39-49). A sequential IIR over ~2M
samples is the worst possible shape for a TPU, so this module restates it
exactly as two hardware-friendly stages:

Resonator recurrence (one pole per bin, constant-Q bandwidth):

    y[n] = alpha * x[n] + (1 - alpha) * e^{i*omega} * y[n-1]

Split the signal into frames of ``HOP_LEN`` samples. Unrolling the recurrence
across one frame gives, with ``b = (1-alpha) * e^{i*omega}``:

    y[(k+1)H - 1] = b^H * y[kH - 1]  +  sum_j alpha * b^{H-1-j} * x[kH + j]
                    \________________/   \_______________________________/
                      per-frame decay          frame "contribution"

* the contribution term is a dense (n_frames x H) @ (H x 2*n_bins) **matmul**
  against a precomputed complex weight table - that's >99% of the FLOPs and it
  runs on the MXU;
* the surviving cross-frame recurrence is a first-order linear scan over
  n_frames elements (~170/s of audio) with a per-bin 2x2 rotation-scaling -
  evaluated with ``lax.associative_scan`` in O(log n_frames) depth.

The result is bit-identical (up to fp32 rounding) to the sequential IIR - see
``resonate_reference`` and tests/test_spectrogram.py - while running at
matmul speed. Post-processing (power, log, top-60dB normalization to [0,1])
matches reference load_audio.py:44-49.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import HOP_LEN, N_BINS, SR, resonator_freqs

# constant-Q quality factor: each bin's bandwidth spans one bin spacing
# (9 bins/octave, symmetric): Q = 1 / (2^(1/18) - 2^(-1/18)) ~= 12.98
Q_FACTOR = 1.0 / (2.0 ** (1.0 / 18.0) - 2.0 ** (-1.0 / 18.0))
# chunk granularity for padding wave lengths (limits jit recompiles)
WAVE_BUCKET = HOP_LEN * 1024  # ~6.1 s


def resonator_alphas(freqs: np.ndarray) -> np.ndarray:
    """per-frequency smoothing heuristic: one-pole bandwidth tracks the
    constant-Q bin bandwidth, so each bin integrates ~Q cycles"""
    return 1.0 - np.exp(-2.0 * np.pi * freqs / (Q_FACTOR * SR))


@lru_cache(maxsize=1)
def _bank_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """precomputed (W, A, alpha) for the matmul+scan formulation.

    W: (H, 2F) real weight table, columns [re | im] of alpha * b^(H-1-j)
    A: (F, 2, 2) per-bin cross-frame rotation-scaling b^H as a 2x2 real matrix
    """
    freqs = resonator_freqs().astype(np.float64)
    alpha = resonator_alphas(freqs)
    omega = 2.0 * np.pi * freqs / SR
    b = (1.0 - alpha) * np.exp(1j * omega)  # (F,)

    j = np.arange(HOP_LEN)
    w = alpha[None, :] * b[None, :] ** (HOP_LEN - 1 - j)[:, None]  # (H, F) complex
    W = np.concatenate([w.real, w.imag], axis=1).astype(np.float32)  # (H, 2F)

    bH = b**HOP_LEN
    A = np.stack(
        [
            np.stack([bH.real, -bH.imag], axis=-1),
            np.stack([bH.imag, bH.real], axis=-1),
        ],
        axis=-2,
    ).astype(np.float32)  # (F, 2, 2)

    return W, A, alpha.astype(np.float32)


def _scan_combine(left, right):
    """combine for the first-order recurrence y_k = A_k y_{k-1} + c_k over
    elements (A, c): (A2 A1, A2 c1 + c2)"""
    a1, c1 = left
    a2, c2 = right
    return a2 @ a1, jnp.einsum("kfij,kfj->kfi", a2, c1) + c2


def _use_pallas_resonator() -> bool:
    import os

    override = os.environ.get("ODT_PALLAS_RESONATOR")
    if override is not None:
        return override not in ("0", "false", "")
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("n_frames", "pallas"))
def _resonate_frames(
    wave: jax.Array, n_frames: int, pallas: bool | None = None
) -> jax.Array:
    """complex resonator states at frame boundaries -> (n_frames, F, 2) [re, im]

    ``pallas`` overrides the backend-based kernel gate; pass False when the
    enclosing program is sharded over a device mesh — Mosaic kernels cannot
    be auto-partitioned by GSPMD, and the associative-scan path partitions
    fine (the featurizer is a tiny slice of a sampling program anyway)."""
    frames = wave[: n_frames * HOP_LEN].reshape(n_frames, HOP_LEN)

    if _use_pallas_resonator() if pallas is None else pallas:
        # one-pass Pallas kernel: 5.6x the associative-scan path on v5e
        from osu_dreamer_tpu.ops.resonator import resonate_frames_pallas

        return resonate_frames_pallas(frames, HOP_LEN, N_BINS, SR)

    W, A, _ = _bank_tables()
    contrib = frames @ jnp.asarray(W)  # (K, 2F) -- the MXU stage
    contrib = jnp.stack(
        [contrib[:, :N_BINS], contrib[:, N_BINS:]], axis=-1
    )  # (K, F, 2)

    A_all = jnp.broadcast_to(jnp.asarray(A), (n_frames, *A.shape))
    _, states = jax.lax.associative_scan(_scan_combine, (A_all, contrib), axis=0)
    return states  # (K, F, 2)


def _normalize_power(power: jax.Array) -> jax.Array:
    """log-power normalized so the loudest frame maps to 1 and anything 60 dB
    below it maps to 0 (reference load_audio.py:44-49)"""
    sig = jnp.maximum(power, 1e-10)
    sig = jnp.log10(sig) - jnp.log10(jnp.max(sig))
    sig = (15.0 * sig + 60.0) / 60.0
    return jnp.clip(sig, 0.0, 1.0)


def make_spec_jax(wave: jax.Array, n_frames: int) -> jax.Array:
    """jit-friendly spectrogram: (N,) float wave -> (F, n_frames) in [0, 1]"""
    states = _resonate_frames(wave, n_frames)
    power = states[..., 0] ** 2 + states[..., 1] ** 2  # (K, F)
    return _normalize_power(power).T  # (F, K)


def make_spec(wave: np.ndarray) -> np.ndarray:
    """host entry point: pads the wave to a bucketed length (so repeated calls
    hit a handful of compiled shapes), featurizes on the accelerator, crops"""
    n = len(wave)
    n_frames = max(1, int(np.ceil(n / HOP_LEN)))
    padded_len = int(np.ceil(max(n, 1) / WAVE_BUCKET)) * WAVE_BUCKET
    buf = np.zeros(padded_len, dtype=np.float32)
    buf[:n] = wave
    spec = make_spec_jax(jnp.asarray(buf), padded_len // HOP_LEN)
    return np.asarray(spec[:, :n_frames])


def spec_for_model_jax(
    wave_i16: jax.Array,
    real_frames: jax.Array,
    n_frames: int,
    out_frames: int,
    pallas: bool | None = None,
) -> jax.Array:
    """traceable core of ``make_spec_for_model``: compose it into a larger
    jitted program (e.g. predict fuses it with the sampling pipeline so each
    song costs ONE device dispatch).

    real_frames is a TRACED scalar so compiles depend only on the wave
    bucket, not the exact song length (one compile per ~6 s size class).
    ``pallas=False`` forces the GSPMD-partitionable scan path (see
    ``_resonate_frames``)."""
    wave = wave_i16.astype(jnp.float32) / 32767.0
    states = _resonate_frames(wave, n_frames, pallas)
    power = states[..., 0] ** 2 + states[..., 1] ** 2  # (K, F)

    # top-60dB normalization over the REAL frames only (masked max)
    valid = (jnp.arange(n_frames) < real_frames)[:, None]
    sig = jnp.maximum(power, 1e-10)
    sig = jnp.log10(sig)
    peak = jnp.max(jnp.where(valid, sig, -jnp.inf))
    sig = jnp.clip((15.0 * (sig - peak) + 60.0) / 60.0, 0.0, 1.0)

    # edge-replicate to the model's chunk-aligned length, still on device
    idx = jnp.minimum(jnp.arange(out_frames), real_frames - 1)
    return sig[idx][None]  # (1, out_frames, F)


def prep_wave_for_model(
    wave: np.ndarray, chunk: int
) -> tuple[np.ndarray, int, int, int]:
    """host-side prep for ``spec_for_model_jax``:
    -> (int16 bucket-padded wave, real_frames, n_frames, out_frames).

    The wave travels as int16 (audio sources are 16-bit; 96 dB SNR is far
    beyond the 60 dB display window) — host links are the E2E bottleneck and
    this halves the bytes."""
    n = len(wave)
    real_frames = max(1, int(np.ceil(n / HOP_LEN)))
    padded_len = int(np.ceil(max(n, 1) / WAVE_BUCKET)) * WAVE_BUCKET
    peak = float(np.abs(wave).max()) if n else 0.0
    scale = 32767.0 / max(peak, 1.0)  # headroom: only scale DOWN if clipping
    buf = np.zeros(padded_len, dtype=np.int16)
    buf[:n] = np.round(wave * min(scale, 32767.0)).astype(np.int16)
    n_frames = padded_len // HOP_LEN
    # out length depends on the BUCKET, so downstream model compiles are
    # shared by every song in the same ~6 s size class
    out_frames = -(-n_frames // chunk) * chunk
    return buf, real_frames, n_frames, out_frames


def spec_for_model_batch(
    waves_i16: jax.Array,
    real_frames: jax.Array,
    n_frames: int,
    out_frames: int,
    pallas: bool | None = None,
) -> jax.Array:
    """batched traceable featurize: (S, len) int16 waves + (S,) real frame
    counts -> (S, out_frames, F). Per-song top-60dB normalization (each song
    peaks against its own loudest frame, exactly like the solo path).

    vmap over the Pallas resonator is SAFE: the batching rule prepends the
    song axis to the grid, but ``pl.program_id`` indexes only the USER grid
    axes — jax's mosaic lowering filters ``vmapped_dims`` out of
    ``user_grid_indices`` (jax/_src/pallas/mosaic/lowering.py), so the
    kernel's cross-tile carry stays keyed on the tile index per song
    (regression: tests/test_ops.py
    test_batched_featurize_keeps_carry_per_song)."""
    return jax.vmap(
        lambda w, r: spec_for_model_jax(w, r, n_frames, out_frames, pallas)[0]
    )(waves_i16, real_frames)


_spec_for_model = jax.jit(spec_for_model_jax, static_argnames=("n_frames", "out_frames"))


def make_spec_for_model(wave: np.ndarray, chunk: int) -> jax.Array:
    """device-resident featurize for inference: one host->device upload of
    the (bucket-padded) wave; returns the chunk-aligned (1, Lp, F) spec as a
    device array that feeds the model directly (no host round trip).

    predict does NOT use this two-dispatch path: it composes
    ``spec_for_model_jax`` directly into its fused sampling program."""
    buf, real_frames, n_frames, out_frames = prep_wave_for_model(wave, chunk)
    return _spec_for_model(jnp.asarray(buf), real_frames, n_frames, out_frames)


def resonate_reference(wave: np.ndarray, hop: int = HOP_LEN) -> np.ndarray:
    """exact sequential-IIR evaluation of the same resonator bank (host,
    O(N*F)); ground truth for validating the matmul+scan formulation"""
    freqs = resonator_freqs().astype(np.float64)
    alpha = resonator_alphas(freqs)
    b = (1.0 - alpha) * np.exp(1j * 2.0 * np.pi * freqs / SR)

    n_frames = int(np.ceil(len(wave) / hop))
    padded = np.zeros(n_frames * hop)
    padded[: len(wave)] = wave

    out = np.empty((n_frames, len(freqs)), dtype=np.complex128)
    y = np.zeros(len(freqs), dtype=np.complex128)
    for k in range(n_frames):
        for j in range(hop):
            y = alpha * padded[k * hop + j] + b * y
        out[k] = y
    return out
