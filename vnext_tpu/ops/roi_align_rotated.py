"""ROIAlignRotated (jnp reference implementation).

Capability parity with detectron2/layers/roi_align_rotated.py (+ csrc/
ROIAlignRotated CUDA): average-pooled bilinear samples over a rotated ROI grid.
ROIs are (batch_idx, cx, cy, w, h, angle_degrees), angle CCW; always aligned
(half-pixel offset), matching the reference's continuous-coordinate convention.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_gather(feat: Array, sx: Array, sy: Array) -> Array:
    """feat [H, W, C]; coords [...]; zero padding outside (with edge clamping à la
    the reference's bilinear_interpolate: y/x in (-1, 0) clamp to 0)."""
    h, w, c = feat.shape
    inside = (sx > -1.0) & (sx < w) & (sy > -1.0) & (sy < h)
    sx = jnp.clip(sx, 0.0, w - 1)
    sy = jnp.clip(sy, 0.0, h - 1)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    out = 0.0
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = jnp.minimum(x0 + dx, w - 1).astype(jnp.int32)
        yi = jnp.minimum(y0 + dy, h - 1).astype(jnp.int32)
        wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
        g = feat.reshape(h * w, c)[(yi * w + xi).reshape(-1)].reshape(*sx.shape, c)
        out = out + g * wgt[..., None]
    return out * inside[..., None]


def roi_align_rotated(
    features: Array,          # [B, H, W, C]
    rois: Array,              # [N, 6]: (batch_idx, cx, cy, w, h, angle_deg)
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> Array:
    """Returns [N, out_h, out_w, C]."""
    out_h, out_w = output_size
    s = max(sampling_ratio, 1)

    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale - 0.5
    cy = rois[:, 2] * spatial_scale - 0.5
    rw = rois[:, 3] * spatial_scale
    rh = rois[:, 4] * spatial_scale
    theta = rois[:, 5] * jnp.pi / 180.0

    bin_w = rw / out_w
    bin_h = rh / out_h
    # sample positions in ROI-local coords (origin at roi center)
    py = (jnp.arange(out_h * s) + 0.5) / s  # in bin units
    px = (jnp.arange(out_w * s) + 0.5) / s

    def one_roi(bi, cx_i, cy_i, bw, bh, th):
        yy = py * bh - rh_half(bh)            # [out_h*s]
        xx = px * bw - rw_half(bw)            # [out_w*s]
        gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
        cos_t = jnp.cos(th)
        sin_t = jnp.sin(th)
        sx = gx * cos_t - gy * sin_t + cx_i
        sy = gx * sin_t + gy * cos_t + cy_i
        sampled = _bilinear_gather(features[bi], sx, sy)       # [hs, ws, C]
        c = sampled.shape[-1]
        return sampled.reshape(out_h, s, out_w, s, c).mean(axis=(1, 3))

    def rw_half(bw):
        return bw * out_w / 2.0

    def rh_half(bh):
        return bh * out_h / 2.0

    return jax.vmap(one_roi)(batch_idx, cx, cy, bin_w, bin_h, theta)
