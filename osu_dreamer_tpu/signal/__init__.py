"""Signal codec layer: beatmap <-> dense per-frame float arrays.

Capability parity with reference L1 (``data/beatmap/``): 9-channel encoding
(7 hit + 2 cursor), gaussian onset bumps, extent masks, cursor path following,
quantized disk format, .osu serialization and the MAP slider fitter.
"""

from .encoding import (
    CURSOR_DIM,
    HIT_DIM,
    NUM_LABELS,
    X_DIM,
    Channel,
    CursorChannels,
    HitChannels,
    get_labels,
    read_beatmap,
    write_beatmap,
)
from .hits import decode_hit_signal, hit_signal
from .cursor import cursor_signal
from .serialize import MapMetadata, decode_beatmap
from .tempo import estimate_tempo

__all__ = [
    "CURSOR_DIM",
    "Channel",
    "CursorChannels",
    "HIT_DIM",
    "HitChannels",
    "MapMetadata",
    "NUM_LABELS",
    "X_DIM",
    "cursor_signal",
    "decode_beatmap",
    "decode_hit_signal",
    "estimate_tempo",
    "get_labels",
    "hit_signal",
    "read_beatmap",
    "write_beatmap",
]
