from .mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
]
