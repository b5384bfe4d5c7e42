"""Spectrogram disk format: uint8-quantized .npy.

Parity with reference data/load_audio.py:53-59 (same dtype, same rounding),
so datasets are interchangeable between the two implementations.
"""

from __future__ import annotations

from typing import BinaryIO

import numpy as np

SPEC_DTYPE = np.uint8


def write_spec(f: BinaryIO, spec: np.ndarray) -> None:
    np.save(f, (spec * np.iinfo(SPEC_DTYPE).max + 0.5).astype(SPEC_DTYPE))


def read_spec(f: BinaryIO) -> np.ndarray:
    return np.load(f).astype(float) / np.iinfo(SPEC_DTYPE).max
