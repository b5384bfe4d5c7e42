"""Audio processing constants and time<->frame maps.

Parity with reference data/load_audio.py:11-34: 9 bins/octave x 8 octaves from
32 Hz, sample rate 2*F_MAX = 16384 Hz, ~6 ms hop (98 samples ≈ 167 frames/s).
"""

from __future__ import annotations

import numpy as np

F_MIN = 32  # ~C1
BINS_PER_OCTAVE = 9
N_OCTAVES = 8
N_BINS = N_OCTAVES * BINS_PER_OCTAVE  # 72
A_DIM = N_BINS
F_MAX = F_MIN * (1 << N_OCTAVES)  # 8192
SR = 2 * F_MAX  # 16384 Hz
MS_PER_FRAME = 6  # approximate
HOP_LEN = (SR * MS_PER_FRAME + 500) // 1000  # 98 samples

FrameTimes = np.ndarray  # (L,) float, milliseconds


def get_frame_for_time(t_ms: int | float) -> int:
    """frame index containing time `t_ms` (milliseconds)"""
    return int(t_ms / 1000 * SR / HOP_LEN)


def get_frame_times(num_frames: int) -> FrameTimes:
    """millisecond timestamps of the first `num_frames` frames"""
    return np.arange(num_frames) * HOP_LEN / SR * 1000.0


def resonator_freqs() -> np.ndarray:
    """the 72 log-spaced resonator center frequencies (Hz)"""
    return np.geomspace(F_MIN, F_MAX, N_BINS, endpoint=False).astype(np.float32)
