"""Device-mesh / sharding helpers: first-class data parallelism over ICI.

The reference trains single-device only (SURVEY.md §2.10: every model.yml
pins ``devices: 1``); this rebuild makes DP a first-class component the TPU
way — a 1-D ``jax.sharding.Mesh`` over the ``data`` axis, batches sharded on
axis 0, parameters replicated, and gradient all-reduce emitted by XLA as
psum over ICI (no NCCL analog to manage). The mesh generalizes: model axes
(``model`` for TP, sequence for SP/ring attention) can be added without
rewriting the train steps because steps are ordinary jitted functions whose
sharding comes from their inputs.

Multi-host: call ``jax.distributed.initialize`` before building the mesh and
the same code spans pods (DP gradients ride ICI intra-pod, DCN across).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices: Iterable[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'"""
    devs = np.array(list(devices) if devices is not None else jax.devices())
    return Mesh(devs, axis_names=("data",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """shard every array's leading (batch) axis across the 'data' axis"""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """replicate a pytree (params / train state) on every device of the mesh"""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
