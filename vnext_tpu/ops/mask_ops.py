"""Mask pasting (reference surface: detectron2/layers/mask_ops.py:275
paste_masks_in_image with its GPU-memory chunking).

TPU-first form: pasting an m x m mask into its box is separable bilinear
resampling, so each instance becomes two small matmuls (per-instance row/column
interpolation matrices) — fixed shapes, no chunking heuristics needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _paste_axis_weights(x0: Array, x1: Array, m: int, size: int) -> Array:
    """[N, size, m] weights mapping mask coords -> image pixels for one axis.

    Uses the reference's grid_sample formulation: image pixel center p maps to
    mask coordinate (p + 0.5 - x0) / (x1 - x0) * m - 0.5, bilinear with zero
    outside the mask.
    """
    n = x0.shape[0]
    pix = jnp.arange(size, dtype=jnp.float32)[None, :] + 0.5  # [1, size]
    span = jnp.maximum(x1 - x0, 1e-6)[:, None]
    coord = (pix - x0[:, None]) / span * m - 0.5  # [N, size]
    lo = jnp.floor(coord)
    frac = coord - lo
    grid = jnp.arange(m, dtype=jnp.float32)[None, None, :]
    w = (
        jnp.where(grid == lo[..., None], 1.0 - frac[..., None], 0.0)
        + jnp.where(grid == lo[..., None] + 1.0, frac[..., None], 0.0)
    )
    return w


def paste_masks_in_image(
    masks: Array,           # [N, m, m] mask probabilities (or logits pre-sigmoid)
    boxes: Array,           # [N, 4] xyxy in image coords
    image_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> Array:
    """Returns [N, H, W] bool (threshold < 0 returns float probabilities)."""
    h, w = image_shape
    m = masks.shape[-1]
    wy = _paste_axis_weights(boxes[:, 1], boxes[:, 3], m, h)  # [N, H, m]
    wx = _paste_axis_weights(boxes[:, 0], boxes[:, 2], m, w)  # [N, W, m]
    out = jnp.einsum("nhm,nmk,nwk->nhw", wy, masks.astype(jnp.float32), wx)
    if threshold >= 0:
        return out >= threshold
    return out
