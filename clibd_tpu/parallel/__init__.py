from .mesh import (
    DATA_AXIS,
    create_mesh,
    data_sharding,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "create_mesh",
    "data_sharding",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
]
