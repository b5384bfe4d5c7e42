from .config import ParallelArgs, Parallelism, build_parallelism, make_global_batch
from .distributed import init_multihost, input_shard
from .mesh import auto_data_parallel, data_parallel_mesh, replicate, shard_batch
from .tp import DEFAULT_TP_RULES, shard_by_rules, tp_mesh

__all__ = [
    "DEFAULT_TP_RULES",
    "ParallelArgs",
    "Parallelism",
    "build_parallelism",
    "make_global_batch",
    "auto_data_parallel",
    "data_parallel_mesh",
    "init_multihost",
    "input_shard",
    "replicate",
    "shard_batch",
    "shard_by_rules",
    "tp_mesh",
]
