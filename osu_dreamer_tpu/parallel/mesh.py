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


def auto_data_parallel(batch_size: int) -> Mesh | None:
    """the data-parallel mesh the fit loops should train on: all local
    devices when more than one is visible, trimmed to the largest device
    count that divides the batch size (None = single device, no mesh).

    This is what turns ``fit-latent``/``fit-denoiser``/``fit-style`` into
    multi-chip runs with zero config: batches shard over 'data', state is
    replicated, and XLA emits the gradient all-reduce over ICI."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    n = next(k for k in range(len(devices), 0, -1) if batch_size % k == 0)
    if n == 1:
        print(
            f"[parallel] batch size {batch_size} shares no divisor with "
            f"{len(devices)} devices; training single-device"
        )
        return None
    if n < len(devices):
        print(
            f"[parallel] batch size {batch_size} not divisible by "
            f"{len(devices)} devices; using {n}"
        )
    else:
        print(f"[parallel] data-parallel over {n} devices")
    return data_parallel_mesh(devices[:n])
