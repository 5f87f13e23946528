from .mesh import (
    init_distributed,
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    spatial_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
    replicate,
    pad_to_multiple,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "spatial_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_spatial",
    "replicate",
    "pad_to_multiple",
]
