"""Sine positional embedding over valid (unpadded) image regions.

Reference surface: idol/models/position_encoding.py:21 (PositionEmbeddingSine with
normalize=True). The reference computes cumulative sums over the not-padding mask;
because our padding is always a bottom/right rectangle, the cumsum at valid pixel
(y, x) is simply (y+1, x+1), so we compute the embedding in closed form from the
per-image valid (h, w) — cheaper and identical on valid pixels.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def sine_position_embedding(
    valid_hw: Array,
    feat_h: int,
    feat_w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    offset: float = 0.5,
) -> Array:
    """[B, H, W, 2*num_pos_feats] sine embedding.

    valid_hw: [B, 2] float/int — number of *valid* rows/cols at this feature level.
    offset: 0.5 reproduces the Deformable-DETR/IDOL convention
    (idol/models/position_encoding.py:45 ``cumsum - 0.5``); 1.0 reproduces the
    Mask2Former convention (mask2former .../position_encoding.py:33-38, plain
    ``cumsum`` with no shift).
    """
    scale = 2 * math.pi
    eps = 1e-6
    b = valid_hw.shape[0]
    ys = jnp.arange(feat_h, dtype=jnp.float32) + offset  # cumsum(y) - (1-offset)
    xs = jnp.arange(feat_w, dtype=jnp.float32) + offset
    vh = valid_hw[:, 0].astype(jnp.float32)[:, None]  # [B, 1]
    vw = valid_hw[:, 1].astype(jnp.float32)[:, None]
    y_embed = ys[None, :] / (vh + eps) * scale  # [B, H]
    x_embed = xs[None, :] / (vw + eps) * scale  # [B, W]

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_y = y_embed[:, :, None] / dim_t  # [B, H, F]
    pos_x = x_embed[:, :, None] / dim_t  # [B, W, F]

    def interleave(p):
        # stack(sin(p[0::2]), cos(p[1::2])) then flatten, matching the reference layout
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
            *p.shape[:-1], -1
        )

    pos_y = interleave(pos_y)  # [B, H, F]
    pos_x = interleave(pos_x)  # [B, W, F]
    pos_y = jnp.broadcast_to(pos_y[:, :, None, :], (b, feat_h, feat_w, num_pos_feats))
    pos_x = jnp.broadcast_to(pos_x[:, None, :, :], (b, feat_h, feat_w, num_pos_feats))
    # channel order: (y-part, x-part), matching torch cat((pos_y, pos_x), dim=3)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
