"""Device mesh + SPMD train-step utilities.

Replaces the reference's process launcher / DDP / comm stack
(detectron2/engine/launch.py:27, utils/comm.py:19, engine/defaults.py:60
create_ddp_model) with the TPU-native equivalent: a ``jax.sharding.Mesh`` over the
data axis, batch-sharded inputs, replicated parameters, and jit — XLA inserts the
gradient psum that DDP's NCCL allreduce performs explicitly (SURVEY.md §2d).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(mesh_shape: Sequence[int] = (-1,), axis_names: Sequence[str] = ("data",),
               devices: Optional[Sequence] = None) -> Mesh:
    """Create a device mesh; -1 infers that axis from the device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a pytree of host arrays with the batch dim sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_device_count() -> int:
    return jax.local_device_count()


def process_index() -> int:
    """Rank of this host (reference surface: comm.get_rank)."""
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_allgather(tree: Any) -> Any:
    """Gather host-side python/numpy data from all processes (reference surface:
    comm.all_gather's gloo object gather). Single-process: identity list."""
    if jax.process_count() == 1:
        return [tree]
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
