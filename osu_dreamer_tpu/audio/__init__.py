"""Audio layer: decoding, resonator-bank spectrogram featurizer, disk formats.

Capability parity with reference L1 (``data/load_audio.py``): same constants
(72 log-spaced bins, 16384 Hz, hop 98 ≈ 6 ms/frame), same uint8-quantized
on-disk spec format, same normalization. The featurizer itself is TPU-native:
the per-sample IIR resonator bank (a Rust crate in the reference) is
reformulated as a frame matmul on the MXU plus a per-frame associative scan
(see ``spectrogram.py``).
"""

from .constants import (
    A_DIM,
    BINS_PER_OCTAVE,
    F_MAX,
    F_MIN,
    HOP_LEN,
    MS_PER_FRAME,
    N_BINS,
    N_OCTAVES,
    SR,
    FrameTimes,
    get_frame_for_time,
    get_frame_times,
)
from .decode import load_wave
from .io import read_spec, write_spec
from .spectrogram import (
    make_spec,
    make_spec_for_model,
    make_spec_jax,
    prep_wave_for_model,
    spec_for_model_batch,
    spec_for_model_jax,
)

__all__ = [
    "A_DIM",
    "BINS_PER_OCTAVE",
    "F_MAX",
    "F_MIN",
    "HOP_LEN",
    "MS_PER_FRAME",
    "N_BINS",
    "N_OCTAVES",
    "SR",
    "FrameTimes",
    "get_frame_for_time",
    "get_frame_times",
    "load_wave",
    "make_spec",
    "make_spec_for_model",
    "prep_wave_for_model",
    "spec_for_model_batch",
    "spec_for_model_jax",
    "make_spec_jax",
    "read_spec",
    "write_spec",
]
