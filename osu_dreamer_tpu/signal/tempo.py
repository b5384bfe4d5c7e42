"""Tempo (timing-point) inference from the predicted onset signal.

The reference emits a single tempo derived from slider velocities and leaves
real timing-point inference as a TODO (reference decode.py:131). This module
goes further: it estimates the beat period and phase from the onset
envelope so generated maps carry a musically meaningful uninherited timing
point (opt-in via ``predict --infer-tempo``).

Method: comb scoring — for each candidate beat period in the playable BPM
range, sum the onset envelope at a grid of beat-aligned offsets (with the
best phase for that period), lightly weighted toward the 140-200 BPM octave
where ranked osu!std maps live. Subdivision ambiguity (half/double tempo)
is resolved by preferring the fastest period whose score stays within 5% of
the best, then octave-shifting into range.
"""

from __future__ import annotations

import numpy as np

MIN_BPM = 60.0
MAX_BPM = 300.0
PREFERRED_LO, PREFERRED_HI = 120.0, 220.0


def estimate_tempo(
    onsets: np.ndarray, frame_times: np.ndarray
) -> tuple[float, float]:
    """onset envelope (L,) in [0,1] + frame times (ms) -> (beat_length_ms,
    offset_ms of the first beat)"""
    if len(frame_times) < 8 or onsets.max() <= 0:
        return 500.0, 0.0

    frame_ms = float(frame_times[1] - frame_times[0])
    env = onsets.astype(np.float64)
    env = env - env.mean()
    env = np.maximum(env, 0.0)

    # candidate beat periods in frames
    min_period = max(2, int(60000.0 / MAX_BPM / frame_ms))
    max_period = min(len(env) // 4, int(60000.0 / MIN_BPM / frame_ms))
    if max_period <= min_period:
        return 500.0, 0.0

    # autocorrelation via FFT (comb base score)
    n = int(2 ** np.ceil(np.log2(2 * len(env))))
    spectrum = np.fft.rfft(env, n)
    acf = np.fft.irfft(spectrum * np.conj(spectrum), n)[: max_period * 4 + 1]
    acf = acf / max(acf[0], 1e-9)

    periods = np.arange(min_period, max_period + 1)
    # comb: sum autocorrelation at multiples of the candidate period
    scores = np.zeros(len(periods))
    for i, p in enumerate(periods):
        lags = np.arange(1, 5) * p
        lags = lags[lags < len(acf)]
        scores[i] = acf[lags].mean() if len(lags) else 0.0

    # mild preference for the typical ranked-map BPM octave
    bpm = 60000.0 / (periods * frame_ms)
    pref = np.where((bpm >= PREFERRED_LO) & (bpm <= PREFERRED_HI), 1.05, 1.0)
    scores = scores * pref

    best = scores.max()
    # fastest period within 5% of the best score (fights half-tempo picks)
    good = np.flatnonzero(scores >= 0.95 * best)
    period = float(periods[good[0]])
    beat_len = period * frame_ms

    # octave-shift into the playable range
    while 60000.0 / beat_len > MAX_BPM:
        beat_len *= 2.0
    while 60000.0 / beat_len < MIN_BPM:
        beat_len /= 2.0

    # joint sub-frame refinement of period x phase: an integer-frame period
    # is off by up to half a frame (~3 ms), which drifts by whole beats over
    # a full song; search +-1 frame around the comb pick at 1/40-frame
    # resolution, scoring onset mass on the resulting beat grid
    p0 = beat_len / frame_ms
    best_p, best_offset, best_mass = p0, 0.0, -1.0
    for p in np.linspace(p0 - 1.0, p0 + 1.0, 81):
        if p < 2.0:
            continue
        n_phase = max(16, int(2 * p))
        phases = np.arange(n_phase) * (p / n_phase)
        n_beats = int((len(env) - p) // p)
        if n_beats < 1:
            continue
        idx = (phases[:, None] + np.arange(n_beats + 1)[None, :] * p).astype(int)
        masses = env[np.minimum(idx, len(env) - 1)].mean(axis=1)
        k = int(np.argmax(masses))
        if masses[k] > best_mass:
            best_mass, best_p, best_offset = float(masses[k]), float(p), float(phases[k])

    return best_p * frame_ms, best_offset * frame_ms
