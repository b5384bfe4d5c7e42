"""Config-driven parallelism: the ``parallel:`` block of the stage configs.

VERDICT r1 item 6: DP/TP/multi-host existed as library code but nothing in a
real config engaged them. This module is the bridge: every fit CLI parses

    parallel:
      dp: -1            # data-parallel devices: -1 = auto (all that divide
                        # the batch), 1 = single device, N = exactly N
      tp: 1             # tensor-parallel span (Megatron-style sharding rules
                        # over a (data, model) mesh; parallel/tp.py)
      coordinator: null # multi-host: jax.distributed coordinator host:port
      num_processes: null
      process_id: null

and calls :func:`build_parallelism` once before touching devices. The result
carries the mesh, a ``prepare_state`` for the fit loop (replicate for DP,
path-rule sharding for TP), and this process's input-pipeline shard.

Multi-host batches: with more than one process, each host feeds only its
local slice; :func:`make_global_batch` assembles the global sharded array
from per-process data (jax.make_array_from_process_local_data), which is the
TPU-native answer to a distributed data loader.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .distributed import init_multihost
from .mesh import auto_data_parallel, data_parallel_mesh, replicate, shard_batch
from .tp import shard_by_rules, tp_mesh


@dataclass
class ParallelArgs:
    dp: int = -1
    tp: int = 1
    # sequence-parallel span (denoiser stage only): the train step runs
    # under shard_map on a (data, sp) mesh with the window length sharded
    # over `sp` — ring attention, halo'd convs, pmean'd reductions
    sp: int = 1
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclass
class Parallelism:
    """resolved parallel context for one fit run"""

    mesh: Any  # jax.sharding.Mesh | None
    prepare_state: Optional[Callable]   # for Stage.prepare_state
    input_shard: Optional[tuple[int, int]]  # (num_shards, index) for streams
    process_index: int
    process_count: int
    # rows THIS process loads per step (global batch / process_count);
    # make_global_batch assembles them into the global sharded batch
    local_batch_size: int = 0
    # name of the sequence-parallel mesh axis when `sp` > 1 (else None);
    # the diffusion fit builds its shard_map train step from it
    sp_axis: Optional[str] = None

    def lockstep_steps(self, local_windows: int) -> Optional[int]:
        """multi-host: the per-epoch train-step count EVERY host must run —
        the minimum across hosts of (local windows // local batch). Hosts
        with ragged input shards would otherwise drift out of lockstep on
        the collectives (one host enters epoch N+1 or exits while another
        still dispatches epoch N) and silently misalign or hang. None when
        single-process (no truncation needed)."""
        if self.process_count <= 1:
            return None
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        local = local_windows // max(self.local_batch_size, 1)
        counts = multihost_utils.process_allgather(jnp.asarray(local))
        return int(counts.min())

    def lockstep_stream(self, batches: Any, lockstep: Optional[int]) -> Any:
        """apply the ``lockstep_steps`` truncation to an epoch's batch
        iterable — the ONE place the lockstep invariant is enforced, shared
        by all three stage fits (pass-through when single-process)"""
        if lockstep is None:
            return batches
        from itertools import islice

        return islice(batches, lockstep)

    def shard_batch(self, batch: Any) -> Any:
        if self.mesh is None or self.sp_axis is not None:
            # sp: the shard_map train step's in_specs place the batch
            return batch
        if self.process_count > 1:
            return make_global_batch(batch, self.mesh)
        return shard_batch(batch, self.mesh)


def make_global_batch(batch: Any, mesh) -> Any:
    """assemble a globally-sharded batch from this process's local arrays
    (each host loads 1/process_count of the global batch)"""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )


def build_parallelism(args: ParallelArgs, batch_size: int) -> Parallelism:
    """resolve the parallel config into a mesh + state-prep + input shard.

    Must run before any other device use when ``coordinator`` is set
    (jax.distributed.initialize requirement).
    """
    if args.coordinator:
        init_multihost(args.coordinator, args.num_processes, args.process_id)
    n_proc, proc_id = jax.process_count(), jax.process_index()

    if n_proc > 1 and batch_size % n_proc != 0:
        raise ValueError(
            f"global batch size {batch_size} must divide evenly over "
            f"{n_proc} processes"
        )

    if args.tp > 1 and args.sp > 1:
        raise ValueError("parallel.tp and parallel.sp cannot be combined (yet)")

    if n_proc > 1 and args.tp <= 1 and args.sp <= 1:
        # multi-host DP: the mesh MUST span every process's devices — a mesh
        # missing any host's devices breaks make_global_batch (each host
        # still feeds its input shard), and no mesh at all trains N
        # divergent models with no gradient sync
        devices = jax.devices()
        if args.dp == 1:
            raise ValueError(
                "parallel.dp=1 with a multi-process coordinator would train "
                "divergent models (each host would optimize alone, no "
                "gradient sync); set dp to the global device count or 'auto'"
            )
        if args.dp > 1 and args.dp != len(devices):
            raise ValueError(
                f"multi-host dp must span every device: parallel.dp={args.dp}"
                f" but {len(devices)} global devices across {n_proc} processes"
            )
        if batch_size % len(devices) != 0:
            raise ValueError(
                f"multi-host: global batch {batch_size} must divide over all "
                f"{len(devices)} devices (trimming the mesh would drop some "
                "hosts' devices)"
            )
    if args.sp > 1 and args.coordinator:
        raise ValueError(
            "parallel.sp is single-process for now: the sp train step's "
            "shard_map expects the full global batch on every host, which "
            "the multi-host input path does not provide (yet)"
        )

    mesh = None
    prepare = None
    sp_axis = None
    if args.sp > 1:
        import numpy as np
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) % args.sp != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by parallel.sp={args.sp}"
            )
        n_data = len(devices) // args.sp
        if batch_size % max(n_data, 1) != 0:
            raise ValueError(
                f"batch size {batch_size} not divisible by the {n_data}-way "
                f"data axis of the (data={n_data}, sp={args.sp}) mesh"
            )
        mesh = Mesh(
            np.array(devices).reshape(n_data, args.sp), axis_names=("data", "sp")
        )
        sp_axis = "sp"
        print(
            f"[parallel] sequence-parallel: (data={n_data}, sp={args.sp}) mesh, "
            "window length sharded over sp"
        )
    elif args.tp > 1:
        mesh = tp_mesh(args.tp)
        n_data = mesh.shape["data"]
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch size {batch_size} not divisible by the {n_data}-way "
                f"data axis of the (data={n_data}, model={args.tp}) mesh; "
                "adjust data.batch_size or parallel.tp"
            )
        prepare = lambda s: shard_by_rules(s, mesh)  # noqa: E731
        print(
            f"[parallel] tensor-parallel: (data={n_data}, model={args.tp}) "
            "mesh, Megatron-style param sharding"
        )
    elif args.dp == 1:
        pass  # explicit single-device
    elif args.dp > 1:
        devices = jax.devices()
        if args.dp > len(devices):
            raise ValueError(f"parallel.dp={args.dp} but only {len(devices)} devices")
        if batch_size % args.dp != 0:
            raise ValueError(
                f"batch size {batch_size} not divisible by parallel.dp={args.dp}"
            )
        mesh = data_parallel_mesh(devices[: args.dp])
        prepare = lambda s: replicate(s, mesh)  # noqa: E731
        print(f"[parallel] data-parallel over {args.dp} devices (configured)")
    else:  # auto
        if n_proc > 1:
            # all-device mesh, validated divisible above — auto trim would
            # silently drop some hosts' devices
            mesh = data_parallel_mesh(jax.devices())
        else:
            mesh = auto_data_parallel(batch_size)
        if mesh is not None:
            prepare = lambda s: replicate(s, mesh)  # noqa: E731

    if mesh is not None and sp_axis is None:
        # DP/TP train steps are plain-jit with sharded operands: GSPMD
        # partitions them, and GSPMD cannot partition Pallas kernels
        # (tpu_custom_call) — flip every auto kernel gate to the XLA paths,
        # which partition correctly. The sp path (and predict/serve) run
        # kernels under shard_map, where they stay enabled.
        from osu_dreamer_tpu.ops.policy import set_gspmd_sharding

        set_gspmd_sharding(True)
        print("[parallel] GSPMD mesh: Pallas kernels disabled in favor of "
              "the partitionable XLA paths")

    shard = (n_proc, proc_id) if n_proc > 1 else None
    if shard is not None:
        print(f"[parallel] multi-host: process {proc_id}/{n_proc}, "
              "input stream sharded per host")
    return Parallelism(
        mesh=mesh,
        prepare_state=prepare,
        input_shard=shard,
        process_index=proc_id,
        process_count=n_proc,
        local_batch_size=batch_size // n_proc,
        sp_axis=sp_axis,
    )
