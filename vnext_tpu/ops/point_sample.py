"""Point sampling for point-rend-style mask losses.

Capability parity with the reference's Mask2Former criterion
(MinVIS_motion/mask2former/modeling/criterion.py: point_sample via
F.grid_sample, get_uncertain_point_coords_with_randomness, calculate_uncertainty
— sampled BCE+dice on K points instead of dense masks, which is both the
accuracy recipe and the memory story of Mask2Former training).

TPU notes: sampling K unstructured points per mask is a 4-corner bilinear
gather. Unlike MSDeformAttn (6 encoder layers x every token x every level),
this runs once per loss call on [N, K] points, so the jnp gather form is fine;
shapes are static (K fixed), keeping it jit-stable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def point_sample(inputs: Array, coords: Array) -> Array:
    """Bilinear sample [N, H, W] mask logits at [N, P, 2] normalized (x, y)
    coords in [0, 1] — torch grid_sample(align_corners=False) semantics.
    Returns [N, P]."""
    n, h, w = inputs.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    flat = inputs.reshape(n, h * w)
    out = jnp.zeros(coords.shape[:-1], inputs.dtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        g = jnp.take_along_axis(flat, idx, axis=1)
        out = out + g * (wgt * valid).astype(inputs.dtype)
    return out


def calculate_uncertainty(logits: Array) -> Array:
    """Uncertainty = -|logit| (criterion.py calculate_uncertainty): highest at
    the decision boundary."""
    return -jnp.abs(logits)


def get_uncertain_point_coords_with_randomness(
    mask_logits: Array,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    rng: jax.Array = None,
) -> Array:
    """[N, num_points, 2] coords: importance-sampled at uncertain locations plus
    a random remainder (point_rend's sampling recipe, fixed shapes)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    n = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    rand_coords = jax.random.uniform(r1, (n, n_sampled, 2))
    logits_at = point_sample(mask_logits, rand_coords)
    scores = calculate_uncertainty(logits_at)
    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain
    _, top_idx = jax.lax.top_k(scores, n_uncertain)                 # [N, n_uncertain]
    picked = jnp.take_along_axis(rand_coords, top_idx[..., None], axis=1)
    if n_random > 0:
        extra = jax.random.uniform(r2, (n, n_random, 2))
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked


def sampled_mask_losses(
    src_masks: Array,      # [N, H, W] logits
    tgt_masks: Array,      # [N, H, W] 0/1
    valid: Array,          # [N] weights
    num_masks: Array,      # normalizer
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    rng: jax.Array = None,
) -> Tuple[Array, Array]:
    """(loss_mask, loss_dice) on sampled points (criterion.py loss_masks)."""
    coords = jax.lax.stop_gradient(
        get_uncertain_point_coords_with_randomness(
            jax.lax.stop_gradient(src_masks), num_points, oversample_ratio,
            importance_sample_ratio, rng,
        )
    )
    src_pts = point_sample(src_masks, coords)                        # [N, P]
    tgt_pts = jax.lax.stop_gradient(point_sample(tgt_masks, coords))
    w = valid.astype(src_pts.dtype)
    bce = (jnp.mean(
        jax.nn.softplus(src_pts) - src_pts * tgt_pts, axis=1) * w).sum() / num_masks
    probs = jax.nn.sigmoid(src_pts)
    numer = 2 * jnp.sum(probs * tgt_pts, axis=1)
    denom = jnp.sum(probs, axis=1) + jnp.sum(tgt_pts, axis=1)
    dice = ((1 - (numer + 1) / (denom + 1)) * w).sum() / num_masks
    return bce, dice
