"""Batched padded images (reference surface: detectron2/structures/image_list.py:11).

``ImageList.from_arrays`` pads a list of HWC images to a shared static shape.  On TPU
we additionally support *fixed* target shapes (``target_size``) so that the train/eval
step compiles once; the per-image true sizes are carried for masking, exactly like the
reference's ``image_sizes`` + padding masks (idol/idol.py:35 MaskedBackbone).

Layout is NHWC (TPU-native), unlike the reference's NCHW.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _round_up(x: int, divisor: int) -> int:
    return ((x + divisor - 1) // divisor) * divisor


@jax.tree_util.register_pytree_node_class
class ImageList:
    """tensor: [N, H, W, C] padded images; image_sizes: [N, 2] true (h, w) per image."""

    def __init__(self, tensor: Array, image_sizes: Array):
        self.tensor = tensor
        self.image_sizes = jnp.asarray(image_sizes, dtype=jnp.int32)

    def tree_flatten(self):
        return (self.tensor, self.image_sizes), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor, obj.image_sizes = children
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    def padding_mask(self) -> Array:
        """[N, H, W] bool, True on padding pixels (matches NestedTensor.mask semantics)."""
        n, h, w = self.tensor.shape[:3]
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        hs = self.image_sizes[:, 0][:, None, None]
        ws = self.image_sizes[:, 1][:, None, None]
        return ~((ys < hs) & (xs < ws))

    @staticmethod
    def from_arrays(
        images: Sequence[np.ndarray],
        size_divisibility: int = 32,
        pad_value: float = 0.0,
        target_size: Optional[Tuple[int, int]] = None,
    ) -> "ImageList":
        """Pad a list of HWC images to a common static (H, W).

        If ``target_size`` is given, all images are padded to exactly that shape
        (images larger than it are an error) — this is the fixed-shape TPU path.
        """
        assert len(images) > 0
        image_sizes = [(int(im.shape[0]), int(im.shape[1])) for im in images]
        if target_size is not None:
            max_h, max_w = target_size
        else:
            max_h = max(s[0] for s in image_sizes)
            max_w = max(s[1] for s in image_sizes)
            if size_divisibility > 1:
                max_h = _round_up(max_h, size_divisibility)
                max_w = _round_up(max_w, size_divisibility)
        batch = []
        for im in images:
            h, w = im.shape[0], im.shape[1]
            if h > max_h or w > max_w:
                raise ValueError(f"Image ({h}, {w}) larger than padded size ({max_h}, {max_w})")
            padded = np.full((max_h, max_w, im.shape[2]), pad_value, dtype=np.float32)
            padded[:h, :w] = im
            batch.append(padded)
        return ImageList(jnp.asarray(np.stack(batch)), jnp.asarray(image_sizes, dtype=jnp.int32))
