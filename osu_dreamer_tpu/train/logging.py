"""TensorBoard metrics + figure logging.

Parity with the reference's observability (SURVEY.md §5): per-stage
TensorBoard run dirs (runs/{latent,denoiser,style}), train/ and val/ scalar
prefixes, learning-rate track, and validation figure logging. Metrics are
computed in-graph and fetched once per log interval (one device->host sync).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


class MetricsLogger:
    """thin TensorBoard writer; degrades to stderr prints when tensorboard
    isn't importable"""

    def __init__(self, run_dir: str | Path, write: bool = True):
        # write=False: a silent sink for non-zero multi-host process ranks
        # (duplicate TB event streams in one dir confuse TensorBoard)
        self.run_dir = Path(run_dir)
        self.write = write
        self._writer = None
        if write:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(logdir=str(self.run_dir))
            except Exception:
                self._writer = None

    def scalars(self, values: Mapping[str, Any], step: int, prefix: str = "") -> None:
        if not self.write:
            return
        for name, value in values.items():
            tag = f"{prefix}{name}" if prefix else name
            v = float(np.asarray(value))
            if self._writer is not None:
                self._writer.add_scalar(tag, v, step)
            else:
                print(f"[{step}] {tag} = {v:.5f}")

    def figure(self, tag: str, fig, step: int) -> None:
        if self._writer is not None:
            self._writer.add_figure(tag, fig, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
