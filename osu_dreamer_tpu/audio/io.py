"""Spectrogram disk format: uint8-quantized .npy.

Parity with reference data/load_audio.py:53-59 (same dtype, same rounding),
so datasets are interchangeable between the two implementations.
"""

from __future__ import annotations

from typing import BinaryIO

import numpy as np

SPEC_DTYPE = np.uint8


def write_spec(f: BinaryIO, spec: np.ndarray) -> None:
    # clip before quantizing: a value outside [0, 1] would WRAP modulo 256
    # through the uint8 cast (1.01 -> 2) and silently corrupt the dataset
    q = np.clip(spec, 0.0, 1.0) * np.iinfo(SPEC_DTYPE).max + 0.5
    np.save(f, q.astype(SPEC_DTYPE))


def read_spec(f: BinaryIO) -> np.ndarray:
    # float32: every consumer is float32; float64 would double the memory
    # bandwidth of the hot data-loading path for nothing
    return np.load(f).astype(np.float32) / np.float32(np.iinfo(SPEC_DTYPE).max)
