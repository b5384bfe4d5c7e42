"""osu! domain layer: .osu beatmap parsing and hit-object geometry.

Capability parity with reference layer L0 (``/root/reference/osu_dreamer/osu/``):
beatmap.py, hit_objects.py, sliders.py, bezier.py, error.py.
"""

from .errors import BeatmapParseError
from .events import Break, Circle, HitObject, Slider, Spinner, Timed, TimingPoint
from .paths import BezierPath, slider_from_control_points
from .beatmap import Beatmap

__all__ = [
    "Beatmap",
    "BeatmapParseError",
    "BezierPath",
    "Break",
    "Circle",
    "HitObject",
    "Slider",
    "Spinner",
    "Timed",
    "TimingPoint",
    "slider_from_control_points",
]
