"""Beatmap signal channel layout and quantized disk format.

Parity with reference data/beatmap/encode.py:15-87: 9 channels (ONSET, COMBO,
SLIDE, SUSTAIN, WHISTLE, FINISH, CLAP, X, Y), 5 difficulty labels
(sr, ar, od, cs, hp), uint8 hit / min-max-uint16 cursor npz disk format. The
on-disk layout is identical, so datasets interchange with the reference.
"""

from __future__ import annotations

from enum import IntEnum
from typing import TYPE_CHECKING

import numpy as np
from jaxtyping import Float

if TYPE_CHECKING:
    from osu_dreamer_tpu.osu import Beatmap


class Channel(IntEnum):
    ONSET = 0
    COMBO = 1
    SLIDE = 2
    SUSTAIN = 3
    WHISTLE = 4
    FINISH = 5
    CLAP = 6
    X = 7
    Y = 8


X_DIM = len(Channel)

HitChannels = [
    Channel.ONSET,
    Channel.COMBO,
    Channel.SLIDE,
    Channel.SUSTAIN,
    Channel.WHISTLE,
    Channel.FINISH,
    Channel.CLAP,
]
HIT_DIM = len(HitChannels)

CursorChannels = [Channel.X, Channel.Y]
CURSOR_DIM = len(CursorChannels)

NUM_LABELS = 5  # (sr, ar, od, cs, hp)

HIT_DTYPE = np.uint8
XY_DTYPE = np.uint16


def get_labels(bm: "Beatmap") -> Float[np.ndarray, "5"]:
    return np.array([bm.sr, bm.ar, bm.od, bm.cs, bm.hp])


def _reject_nan(x: np.ndarray, what: str) -> np.ndarray:
    if np.isnan(x).any():
        raise ValueError(f"{what} contains nan")
    return x


def write_beatmap(f, bm: "Beatmap", frame_times: Float[np.ndarray, "L"]) -> None:
    """encode + quantize a beatmap to one npz: uint8 hit signals, min-max
    normalized uint16 cursor + (xy_min, xy_rng) dequantization params, labels"""
    from .cursor import cursor_signal
    from .hits import hit_signal

    hit = _reject_nan(hit_signal(bm, frame_times), "hit signal")
    xy = _reject_nan(cursor_signal(bm, frame_times), "cursor signal")

    xy_min = xy.min(axis=1, keepdims=True)
    xy_rng = xy.max(axis=1, keepdims=True) - xy_min
    xy_rng[xy_rng == 0.0] = 1.0

    np.savez(
        f,
        allow_pickle=False,
        hit=np.round(hit * np.iinfo(HIT_DTYPE).max).astype(HIT_DTYPE),
        xy=np.round((xy - xy_min) / xy_rng * np.iinfo(XY_DTYPE).max).astype(XY_DTYPE),
        xy_min=xy_min,
        xy_rng=xy_rng,
        labels=_reject_nan(get_labels(bm), "labels"),
    )


def read_beatmap(f) -> tuple[Float[np.ndarray, "9 L"], Float[np.ndarray, "5"]]:
    """-> ((X_DIM, L) float signal, (NUM_LABELS,) labels)"""
    with np.load(f) as npz:
        hit = npz["hit"].astype(float) / np.iinfo(HIT_DTYPE).max
        xy = npz["xy"].astype(float) / np.iinfo(XY_DTYPE).max
        signal = np.concatenate([hit, xy * npz["xy_rng"] + npz["xy_min"]])
        return signal, npz["labels"]
