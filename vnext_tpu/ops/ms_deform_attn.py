"""Multi-scale deformable attention core (pure jnp reference implementation).

Numerically matches the reference CUDA op / its grid_sample fallback
(projects/IDOL/idol/models/ops/functions/ms_deform_attn_func.py:42
``ms_deform_attn_core_pytorch``): per query, bilinearly sample each of L feature
levels at P offset points per head (align_corners=False, zero padding) and reduce
with softmaxed attention weights.

This file is the *semantic oracle*: the Pallas TPU kernel
(ms_deform_attn_pallas.py) is validated against it, exactly as the reference
validates CUDA against grid_sample (idol/models/ops/test.py:32).

Shapes (all static):
    value:              [B, S, M, D]    S = sum_l H_l*W_l
    spatial_shapes:     static tuple ((H_0, W_0), ...) — python ints, not traced
    sampling_locations: [B, Q, M, L, P, 2]  normalized to [0, 1]
    attention_weights:  [B, Q, M, L, P]  (already softmaxed over L*P)
Returns:
    output:             [B, Q, M*D]
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _level_start_indices(spatial_shapes: Sequence[Tuple[int, int]]):
    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w
    return starts, acc


def ms_deform_attn_core_jnp(
    value: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
) -> Array:
    """Pure-jnp MSDeformAttn; differentiable via JAX autodiff (gather -> scatter-add)."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    starts, total = _level_start_indices(spatial_shapes)
    assert total == S, f"value length {S} != sum of spatial shapes {total}"

    # [B, M, S, D] so per-(batch, head) rows can be gathered with take_along_axis
    value_bm = jnp.moveaxis(value, 2, 1)

    out = jnp.zeros((B, M, Q, D), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, starts[lvl], h * w, axis=2)  # [B,M,HW,D]
        # grid_sample(align_corners=False) pixel coords: x = loc_x * W - 0.5
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, M, P, 2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = None
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (tx if dx else (1.0 - tx)) * (ty if dy else (1.0 - ty))  # [B,Q,M,P]
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # [B,Q,M,P]
            idx_bm = jnp.moveaxis(idx, 2, 1).reshape(B, M, Q * P)  # [B,M,QP]
            g = jnp.take_along_axis(v_l, idx_bm[..., None], axis=2)  # [B,M,QP,D]
            g = g.reshape(B, M, Q, P, D)
            wv = (wgt * valid).astype(value.dtype)
            wv = jnp.moveaxis(wv, 2, 1)  # [B,M,Q,P]
            aw = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1).astype(value.dtype)
            contrib = jnp.einsum("bmqp,bmqpd->bmqd", wv * aw, g)
            acc = contrib if acc is None else acc + contrib
        out = out + acc

    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D)


def ms_deform_attn(
    value: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
    impl: str = "auto",
) -> Array:
    """Dispatch between the jnp reference and the Pallas TPU kernel."""
    if impl == "jnp":
        return ms_deform_attn_core_jnp(value, spatial_shapes, sampling_locations, attention_weights)
    if impl in ("pallas", "auto"):
        try:
            from .ms_deform_attn_pallas import ms_deform_attn_pallas

            if impl == "pallas" or jax.default_backend() == "tpu":
                return ms_deform_attn_pallas(
                    value, spatial_shapes, sampling_locations, attention_weights
                )
        except ImportError:
            if impl == "pallas":
                raise
    return ms_deform_attn_core_jnp(value, spatial_shapes, sampling_locations, attention_weights)
