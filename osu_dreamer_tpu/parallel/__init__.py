from .distributed import init_multihost, input_shard
from .mesh import auto_data_parallel, data_parallel_mesh, replicate, shard_batch

__all__ = [
    "auto_data_parallel",
    "data_parallel_mesh",
    "init_multihost",
    "input_shard",
    "replicate",
    "shard_batch",
]
