"""Deformable convolution v1/v2 (jnp reference implementation).

Capability parity with detectron2/layers/deform_conv.py (DeformConv /
ModulatedDeformConv backed by csrc/deformable/*.cu): each output location samples
its KxK taps at learned offsets (v2 adds per-tap modulation), then contracts with
the conv weights.

Implementation: per kernel tap, bilinearly sample the input at the offset grid
(separable-matmul form would follow the MSDA kernel's pattern; this is the
correctness-first gather form since DCN backbones are an optional stage —
SURVEY.md §2b "only needed for DCN backbones").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_sample_nhwc(x: Array, sx: Array, sy: Array) -> Array:
    """Sample x [B, H, W, C] at float coords (sx, sy) [B, Ho, Wo]; zeros outside."""
    b, h, w, c = x.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    out = 0.0
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yi_c * w + xi_c                            # [B, Ho, Wo]
        g = jnp.take_along_axis(
            x.reshape(b, h * w, c),
            flat_idx.reshape(b, -1, 1),
            axis=1,
        ).reshape(*flat_idx.shape, c)
        out = out + g * (wgt * valid)[..., None]
    return out


def deform_conv2d(
    x: Array,                 # [B, H, W, Cin]
    offsets: Array,           # [B, Ho, Wo, 2*K*K]  (dy, dx) per tap, torch layout
    weight: Array,            # [Kh, Kw, Cin, Cout]
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    modulation: Optional[Array] = None,  # [B, Ho, Wo, K*K] for DCNv2
) -> Array:
    """Returns [B, Ho, Wo, Cout]."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")      # [Ho, Wo]

    out = jnp.zeros((b, ho, wo, cout), jnp.float32)
    k = 0
    for iy in range(kh):
        for ix in range(kw):
            off = offsets[..., 2 * k : 2 * k + 2].astype(jnp.float32)
            sy = gy[None] + iy * dilation + off[..., 0]
            sx = gx[None] + ix * dilation + off[..., 1]
            sampled = _bilinear_sample_nhwc(x, sx, sy)        # [B, Ho, Wo, Cin]
            if modulation is not None:
                sampled = sampled * modulation[..., k : k + 1].astype(sampled.dtype)
            out = out + jnp.einsum(
                "bhwc,co->bhwo", sampled.astype(jnp.float32),
                weight[iy, ix].astype(jnp.float32),
            )
            k += 1
    if bias is not None:
        out = out + bias
    return out
