"""Parse-error sentinel. Parity: reference osu/error.py:2."""


class BeatmapParseError(Exception):
    """raised when a .osu file cannot be interpreted as a valid std beatmap"""
