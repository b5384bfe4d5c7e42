"""Serving subsystem: resident generation service + HTTP front-end.

Beyond the reference (whose inference surface is the one-shot
scripts/predict.py CLI): a production deployment runs a process that owns
the chip, batches concurrent requests through one compiled program, and
streams ``.osz`` mapsets back over HTTP. See service.py for the batching
model and http.py for the wire surface; the CLI entry point is
``osu-dreamer-tpu serve``.
"""

from .http import MapServer
from .service import GeneratorService

__all__ = ["GeneratorService", "MapServer"]
