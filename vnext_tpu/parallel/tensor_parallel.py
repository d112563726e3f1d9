"""Tensor- and sequence-parallel sharding rules.

The reference is DDP-only (SURVEY.md §2d: "Data parallel — the only
parallelism"). On TPU, GSPMD makes additional axes nearly free to express:

- ``infer_tp_specs`` builds a PartitionSpec tree over the parameter pytree by
  rule — large Dense/Conv kernels shard their output-feature axis over the
  "model" mesh axis, their biases likewise; everything else replicates. XLA
  propagates the shardings through the jitted step and inserts the
  reduce-scatter/all-gather collectives, so no module rewrites are needed
  (this is megatron-style column parallelism derived from shapes).
- ``time_sharding`` shards the frame axis of a video clip over the mesh —
  sequence parallelism for clip inference. IDOL treats frames as batch
  entries (reference idol.py:252 BATCH_INFER_LEN chunks the clip in *time* on
  one GPU), so spreading frames across devices is the TPU-native upgrade: one
  jitted call, XLA overlaps per-frame compute, no host chunking loop.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_tp_specs(params: Any, mesh: Mesh, axis: str = "model",
                   min_features: int = 256) -> Any:
    """PartitionSpec tree: shard the LAST axis of big kernels over ``axis``.

    A kernel is sharded when its final dim is >= min_features and divisible by
    the mesh axis size; 1-D params (bias/scale) shard when they match the same
    rule. Returns specs usable as jit in_shardings / device_put targets.
    """
    n = mesh.shape[axis]

    def spec_for(path, x):
        shape = getattr(x, "shape", ())
        if not shape:
            return P()
        last = shape[-1]
        if last >= min_features and last % n == 0:
            return P(*([None] * (len(shape) - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_tp(params: Any, mesh: Mesh, axis: str = "model",
             min_features: int = 256) -> Any:
    """device_put the parameter tree with inferred tensor-parallel shardings."""
    specs = infer_tp_specs(params, mesh, axis, min_features)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def time_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [T, ...] clip tensors: frames spread over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def shard_clip(frames: Any, sizes: Any, mesh: Mesh, axis: str = "data"):
    """Place (frames [T, H, W, 3], sizes [T, 2]) with T sharded over the mesh.

    T must be a multiple of the axis size — clip padding policy is the caller's
    (vis_inference pads clips to a fixed length already).
    """
    s = time_sharding(mesh, axis)
    return jax.device_put(frames, s), jax.device_put(sizes, s)


def make_sharded_clip_inference(model, mesh: Mesh, axis: str = "data",
                                donate: bool = False):
    """Jit IDOL-style clip inference with frames sharded across devices.

    Returns ``fn(params, frames, sizes)`` where params are replicated and the
    clip's frame axis is split over ``axis``; per-frame outputs come back with
    the same frame sharding (fetch to host for the tracker).
    """
    from ..models import IDOL

    repl = NamedSharding(mesh, P())
    tsh = time_sharding(mesh, axis)

    def fn(params, frames, sizes):
        return model.apply({"params": params}, frames, sizes, method=IDOL.inference)

    return jax.jit(
        fn,
        in_shardings=(None, tsh, tsh),
        donate_argnums=(1,) if donate else (),
    )
