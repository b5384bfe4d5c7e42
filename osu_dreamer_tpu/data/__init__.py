"""Dataset / input-pipeline layer (reference L2, ``data/dataset.py`` +
``data/modules/``): ingest from the HF corpus or a local mapset library,
mapset-level holdout, windowed training streams with shuffle-buffer and flip
augmentation, batching with drop-last (stable jit shapes), and host->device
prefetch.

All of it is host-side Python by design: the accelerator only ever sees
fixed-shape batches, so the pipeline stays a plain generator stack that a
background thread keeps ahead of the device (SURVEY.md §2.10 "dataloader
worker parallelism" -> host-side prefetch feeding device double-buffering).
"""

from .pipeline import (
    LatentSample,
    SignalSample,
    batched,
    hold_out_mapsets,
    latent_windows,
    pad_to_multiple,
    prefetch,
    signal_windows,
)

__all__ = [
    "LatentSample",
    "SignalSample",
    "batched",
    "hold_out_mapsets",
    "latent_windows",
    "pad_to_multiple",
    "prefetch",
    "signal_windows",
]
