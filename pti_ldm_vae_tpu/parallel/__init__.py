from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    barrier_sync,
    data_sharding,
    make_mesh,
    process_rank,
    replicated,
    shard_batch,
    world_size,
)
from .multihost import maybe_initialize_distributed
from .spatial import shard_batch_spatial, spatial_sharding
from .tensor import tensor_parallel_params

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "barrier_sync",
    "data_sharding",
    "make_mesh",
    "maybe_initialize_distributed",
    "process_rank",
    "replicated",
    "shard_batch",
    "shard_batch_spatial",
    "tensor_parallel_params",
    "spatial_sharding",
    "world_size",
]
