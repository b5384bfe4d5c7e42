"""Multi-host initialization and cross-host input sharding.

TPU-native equivalent of a distributed-comm backend (SURVEY.md §2.10): call
``init_multihost`` once per process before touching devices and every
collective in the jitted programs spans the full pod — XLA emits them over
ICI within a pod and DCN across pods; there is no NCCL/MPI analog to manage.
"""

from __future__ import annotations

import jax


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """initialize jax.distributed (no-op single-process when no coordinator
    is configured); returns (process_index, process_count)"""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def input_shard() -> tuple[int, int]:
    """(num_shards, shard_index) for this process's input pipeline — pass to
    ``signal_windows`` / ``latent_windows`` so each host streams a disjoint
    subset of the dataset"""
    return jax.process_count(), jax.process_index()
