"""Shared VMEM-budget tiling for the fused backward kernels.

A v5e core has ~16 MB of VMEM; kernels budget against a conservative
14 MiB so the Mosaic pipeliner keeps headroom for double-buffering. Each
kernel supplies its own footprint model (their working sets differ); this
module owns the budget constant and the shrink-until-it-fits search so a
TPU-generation retune happens in exactly one place.
"""

from __future__ import annotations

from typing import Callable, Optional

# ~16 MB v5e VMEM minus pipeline headroom
VMEM_BUDGET_BYTES = 14 * 2**20


def shrink_tile_to_budget(
    vmem_bytes: Callable[[int], int], tile: int, min_tile: int = 64
) -> Optional[int]:
    """largest power-of-two shrink of ``tile`` whose footprint fits the
    budget, or None if even ``min_tile`` cannot fit"""
    while tile > min_tile and vmem_bytes(tile) > VMEM_BUDGET_BYTES:
        tile //= 2
    return tile if vmem_bytes(tile) <= VMEM_BUDGET_BYTES else None
