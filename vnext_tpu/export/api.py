"""Model export (reference surface: detectron2/export — Caffe2Tracer/torchscript).

The TPU-native deployment artifact is a serialized StableHLO program via
``jax.export``: a self-contained, version-stable compiled function that any
PJRT runtime (TPU serving stacks, IREE, XLA-AOT) can load — playing the role
the reference's TorchScript/ONNX exports play for torch.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax


def export_stablehlo(fn: Callable, example_args: Sequence[Any]):
    """Trace+lower fn(*example_args) to a serializable jax.export.Exported."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    return exported


def save_exported(exported, path: str) -> None:
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return jexport.deserialize(bytearray(blob))
