from .mesh import (
    batch_sharding,
    build_mesh,
    is_main_process,
    local_device_count,
    process_allgather,
    process_count,
    process_index,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "is_main_process",
    "local_device_count",
    "process_allgather",
    "process_count",
    "process_index",
    "replicate",
    "replicated",
    "shard_batch",
]
