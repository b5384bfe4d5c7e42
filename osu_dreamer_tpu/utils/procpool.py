"""Spawn-context process pool for host-side .osu serialization.

Shared by bulk predict (cli/commands.py) and the serve service: the decode
tail (peak-pick + slider MAP fit + text render) is GIL-bound numpy/python,
so scaling past one core needs processes.

- spawn, not fork: the parent runs a multithreaded JAX runtime and forking
  it can deadlock.
- the TPU-relay env var is scrubbed while the workers start (spawn is eager
  in ``Pool.__init__``) so each worker gets a plain interpreter: the
  sitecustomize in relay images would otherwise open a device-relay session
  per process. Workers never touch JAX — they only run the host-side signal
  codec.
"""

from __future__ import annotations

import multiprocessing
import os


def spawn_serialize_pool(workers: int):
    ctx = multiprocessing.get_context("spawn")
    saved = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        return ctx.Pool(workers)
    finally:
        if saved is not None:
            os.environ["PALLAS_AXON_POOL_IPS"] = saved
