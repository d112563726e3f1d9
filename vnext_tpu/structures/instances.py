"""Fixed-capacity ``Instances`` (reference surface: detectron2/structures/instances.py:7).

The reference ``Instances`` holds a variable number N of per-image objects. Variable
lengths are hostile to XLA (every N recompiles), so the TPU-native design pads every
field to a static ``capacity`` and carries a boolean ``valid`` mask. All fields share
the leading capacity dimension; ``image_size`` is static aux data.

Registered as a pytree so Instances can flow through jit/vmap/scan.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@jax.tree_util.register_pytree_node_class
class Instances:
    def __init__(self, image_size: Tuple[int, int], **fields):
        self._image_size = tuple(int(s) for s in image_size)
        self._fields: Dict[str, Any] = {}
        for k, v in fields.items():
            self.set(k, v)

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        names = sorted(self._fields.keys())
        return tuple(self._fields[n] for n in names), (self._image_size, tuple(names))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, names = aux
        obj = object.__new__(cls)
        obj._image_size = image_size
        obj._fields = dict(zip(names, children))
        return obj

    # -- accessors --------------------------------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name not in self._fields:
            raise AttributeError(f"Instances has no field '{name}'")
        return self._fields[name]

    def set(self, name: str, value: Any) -> None:
        if hasattr(value, "shape") and len(self._fields):
            n = self.capacity
            if n is not None and value.shape[0] != n:
                raise ValueError(
                    f"Field '{name}' has leading dim {value.shape[0]}, expected {n}"
                )
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get(self, name: str) -> Any:
        return self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    @property
    def capacity(self):
        for v in self._fields.values():
            if hasattr(v, "shape") and len(v.shape) > 0:
                return v.shape[0]
        return None

    def __len__(self) -> int:
        n = self.capacity
        if n is None:
            raise NotImplementedError("Empty Instances does not support __len__")
        return n

    def num_valid(self):
        """Number of real (non-padding) instances; a traced scalar under jit."""
        if "valid" in self._fields:
            return jnp.sum(self._fields["valid"].astype(jnp.int32))
        return jnp.asarray(self.capacity or 0, dtype=jnp.int32)

    # -- transforms ---------------------------------------------------------------
    def __getitem__(self, item) -> "Instances":
        """Static indexing (slices / fixed index arrays) — keeps shapes static."""
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            ret.set(k, v[item])
        return ret

    def to_numpy(self) -> "Instances":
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            ret.set(k, np.asarray(v))
        return ret

    @staticmethod
    def cat(instance_lists) -> "Instances":
        assert len(instance_lists) > 0
        image_size = instance_lists[0].image_size
        ret = Instances(image_size)
        for k in instance_lists[0]._fields.keys():
            ret.set(k, jnp.concatenate([i.get(k) for i in instance_lists], axis=0))
        return ret

    def pad_to(self, capacity: int, pad_values: Dict[str, Any] | None = None) -> "Instances":
        """Pad all fields to a fixed capacity, setting/extending the 'valid' mask."""
        pad_values = pad_values or {}
        n = self.capacity or 0
        if n > capacity:
            raise ValueError(f"Cannot pad {n} instances into capacity {capacity}")
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            v = jnp.asarray(v)
            pad_width = [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1)
            fill = pad_values.get(k, 0)
            ret.set(k, jnp.pad(v, pad_width, constant_values=fill))
        if "valid" not in self._fields:
            ret.set("valid", jnp.arange(capacity) < n)
        return ret

    def __repr__(self) -> str:
        field_desc = ", ".join(
            f"{k}: {getattr(v, 'shape', type(v).__name__)}" for k, v in self._fields.items()
        )
        return f"Instances(capacity={self.capacity}, image_size={self._image_size}, fields=[{field_desc}])"
