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
from .tensor_parallel import (
    apply_tp,
    infer_tp_specs,
    make_sharded_clip_inference,
    shard_clip,
    time_sharding,
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
    "apply_tp",
    "infer_tp_specs",
    "make_sharded_clip_inference",
    "shard_clip",
    "time_sharding",
]
