"""Torch-parity image resizing as fixed-shape jnp ops.

On TPU, separable resize is expressed as two small dense matmuls (MXU-friendly)
instead of gathers. Semantics match ``F.interpolate`` so that mask AP is preserved:

- ``resize_bilinear``: align_corners=False, half-pixel centers, edge clamp.
- ``resize_bilinear_ac``: align_corners=True.
- ``resize_nearest``: torch 'nearest' floor convention.
- ``aligned_bilinear``: the CondInst upsampler
  (reference: projects/IDOL/idol/models/segmentation_condInst.py:616).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic interpolation matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), (1.0 - w_hi).astype(np.float32))
    np.add.at(mat, (rows, hi), w_hi.astype(np.float32))
    return mat


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    # torch 'nearest' uses floor(i * in / out)
    src = np.minimum((i * in_size / out_size).astype(np.int64), in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), src] = 1.0
    return mat


def _apply_separable(x: Array, mat_h: np.ndarray, mat_w: np.ndarray) -> Array:
    """Apply per-axis resize matrices to the last two dims of x ([..., H, W])."""
    mh = jnp.asarray(mat_h, dtype=x.dtype)
    mw = jnp.asarray(mat_w, dtype=x.dtype)
    x = jnp.einsum("oh,...hw->...ow", mh, x)
    x = jnp.einsum("pw,...ow->...op", mw, x)
    return x


def resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize of [..., H, W] with torch align_corners=False semantics."""
    return _apply_separable(
        x,
        _bilinear_matrix(x.shape[-2], out_h, False),
        _bilinear_matrix(x.shape[-1], out_w, False),
    )


def resize_bilinear_ac(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with align_corners=True semantics."""
    return _apply_separable(
        x,
        _bilinear_matrix(x.shape[-2], out_h, True),
        _bilinear_matrix(x.shape[-1], out_w, True),
    )


def resize_nearest(x: Array, out_h: int, out_w: int) -> Array:
    """Nearest resize of [..., H, W] with torch floor convention."""
    return _apply_separable(
        x,
        _nearest_matrix(x.shape[-2], out_h),
        _nearest_matrix(x.shape[-1], out_w),
    )


@functools.lru_cache(maxsize=64)
def _aligned_upsample_matrix(in_size: int, factor: int) -> np.ndarray:
    """[factor*in, in] matrix realizing aligned_bilinear along one axis.

    aligned_bilinear pads the input by one (replicate right/bottom), bilinearly
    upsamples with align_corners=True to f*n+1, pads the front by f//2 (replicate)
    and keeps the first f*n samples. With align_corners=True the source coordinate
    of output i is exactly i/f on the padded axis, so each output is a 2-tap lerp.
    """
    n, f = in_size, factor
    out = f * n
    mat = np.zeros((out, n + 1), dtype=np.float32)
    for i in range(out):
        # position on the (n+1)-long padded axis after front-pad of f//2 and crop
        j = i - f // 2
        if j < 0:
            j = 0
        q, r = divmod(j, f)
        w = r / f
        mat[i, q] += 1.0 - w
        if w > 0:
            mat[i, min(q + 1, n)] += w
    # fold the replicate right-pad (index n duplicates index n-1) into an [out, n] matrix
    folded = mat[:, :n].copy()
    folded[:, n - 1] += mat[:, n]
    return folded


def aligned_bilinear(x: Array, factor: int) -> Array:
    """CondInst-aligned upsampling of [..., H, W] by an integer factor."""
    assert factor >= 1 and int(factor) == factor
    if factor == 1:
        return x
    return _apply_separable(
        x,
        _aligned_upsample_matrix(x.shape[-2], factor),
        _aligned_upsample_matrix(x.shape[-1], factor),
    )


def compute_locations(h: int, w: int, stride: int = 1) -> Array:
    """[H*W, 2] pixel-center (x, y) locations (reference: segmentation_condInst.py:641)."""
    shifts_x = jnp.arange(0, w * stride, step=stride, dtype=jnp.float32)
    shifts_y = jnp.arange(0, h * stride, step=stride, dtype=jnp.float32)
    shift_y, shift_x = jnp.meshgrid(shifts_y, shifts_x, indexing="ij")
    locations = jnp.stack([shift_x.reshape(-1), shift_y.reshape(-1)], axis=1) + stride // 2
    return locations
