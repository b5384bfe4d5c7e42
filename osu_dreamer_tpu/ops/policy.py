"""Kernel-dispatch policy shared by every fused-op gate.

Pallas TPU kernels lower to ``tpu_custom_call``, which GSPMD cannot
partition: inside a plain-jit step with sharded operands (the DP/TP
training path) the compiler would either fail or force the operands
replicated — an all-gather of the global batch onto every chip that
silently erases the parallelism. shard_map paths are fine (each shard runs
the whole kernel on its local block), so bulk predict / serve / the sp
train step keep their kernels.

``build_parallelism`` flips this flag when it builds a GSPMD-partitioned
mesh; every auto kernel gate (attention, SwiGLU, FiLM) consults it.
"""

from __future__ import annotations

_gspmd_sharding_active = False


def set_gspmd_sharding(active: bool) -> None:
    global _gspmd_sharding_active
    _gspmd_sharding_active = bool(active)


def gspmd_sharding_active() -> bool:
    return _gspmd_sharding_active
