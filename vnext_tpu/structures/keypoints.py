"""Keypoints container (reference surface: detectron2/structures/keypoints.py:239).

Stores [N, K, 3] (x, y, visibility) keypoints as a pytree, with heatmap
conversion for keypoint heads."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.tree_util.register_pytree_node_class
class Keypoints:
    def __init__(self, tensor: Array):
        tensor = jnp.asarray(tensor, jnp.float32)
        if tensor.ndim != 3 or tensor.shape[-1] != 3:
            raise ValueError(f"Keypoints tensor must be (N, K, 3), got {tensor.shape}")
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Keypoints":
        t = self.tensor[item]
        if t.ndim == 2:
            t = t[None]
        return Keypoints(t)

    def to_heatmap(self, boxes: Array, heatmap_size: int) -> Tuple[Array, Array]:
        """Discretize keypoints into per-ROI heatmap indices (reference
        keypoints.py _keypoints_to_heatmap). boxes: [N, 4] xyxy.

        Returns (heatmap index [N, K] int, valid [N, K] bool)."""
        x1, y1, x2, y2 = [boxes[:, i : i + 1] for i in range(4)]
        sx = heatmap_size / jnp.maximum(x2 - x1, 1e-6)
        sy = heatmap_size / jnp.maximum(y2 - y1, 1e-6)
        x = (self.tensor[..., 0] - x1) * sx
        y = (self.tensor[..., 1] - y1) * sy
        xi = jnp.clip(jnp.floor(x), 0, heatmap_size - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(y), 0, heatmap_size - 1).astype(jnp.int32)
        inside = (
            (self.tensor[..., 0] >= x1) & (self.tensor[..., 0] < x2)
            & (self.tensor[..., 1] >= y1) & (self.tensor[..., 1] < y2)
        )
        valid = inside & (self.tensor[..., 2] > 0)
        return yi * heatmap_size + xi, valid

    @staticmethod
    def from_heatmap(heatmaps: Array, boxes: Array) -> Array:
        """Heatmap argmax -> image-space keypoints [N, K, 3] (x, y, score)."""
        n, hs, _, k = heatmaps.shape
        flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, k, hs * hs)
        idx = jnp.argmax(flat, axis=-1)
        score = jnp.max(jax.nn.softmax(flat, axis=-1), axis=-1)
        yi = (idx // hs).astype(jnp.float32) + 0.5
        xi = (idx % hs).astype(jnp.float32) + 0.5
        x1, y1, x2, y2 = [boxes[:, i : i + 1] for i in range(4)]
        x = x1 + xi / hs * (x2 - x1)
        y = y1 + yi / hs * (y2 - y1)
        return jnp.stack([x, y, score], axis=-1)
