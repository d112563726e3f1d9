"""CondInst dynamic-convolution mask head (flax, NHWC).

Capability parity with idol/models/segmentation_condInst.py:31 (CondInst_segm):
a small FPN-style conv tower fuses the three finest encoder memory levels into
stride-8 mask features (MaskHeadSmallConv, reference :478), a controller MLP emits
169 dynamic parameters per query (3 conv layers, 8 channels, rel-coords), and the
dynamic mask head is evaluated.

TPU-first redesign: the reference realizes dynamic convs as grouped 1x1 torch convs
with ragged instance counts; here they are fixed-shape batched einsums over padded
instance slots — every matmul lands on the MXU and the whole head jits once.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.interpolate import aligned_bilinear, compute_locations, resize_nearest

Array = jnp.ndarray
Dtype = Any

DYNAMIC_CHANNELS = 8
CONTROLLER_LAYERS = 3


def dynamic_params_layout(in_channels: int, rel_coord: bool = True) -> Tuple[List[int], List[int]]:
    """(weight_nums, bias_nums) per dynamic layer (reference :46-60)."""
    c0 = in_channels + (2 if rel_coord else 0)
    weight_nums = [c0 * DYNAMIC_CHANNELS, DYNAMIC_CHANNELS * DYNAMIC_CHANNELS, DYNAMIC_CHANNELS]
    bias_nums = [DYNAMIC_CHANNELS, DYNAMIC_CHANNELS, 1]
    return weight_nums, bias_nums


def num_dynamic_params(in_channels: int, rel_coord: bool = True) -> int:
    w, b = dynamic_params_layout(in_channels, rel_coord)
    return sum(w) + sum(b)


class MaskHeadSmallConv(nn.Module):
    """Fuse 3 encoder memory levels (strides 8/16/32) into stride-8 mask features.

    Output channels = dim // 32 (8 for dim=256), matching the reference tower
    lay3 -> +up -> lay4 -> +up -> dcn -> lay1 -> lay2 (reference :478-545, fpns=None).
    """

    dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Array:
        """feats: [stride8, stride16, stride32] NHWC; returns [B, H8, W8, dim//32]."""
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_uniform(), name=name,
        )
        x = conv(self.dim, "lay3")(feats[2])
        x = nn.relu(x)
        h, w = feats[1].shape[1], feats[1].shape[2]
        x = feats[1] + resize_nearest(x.transpose(0, 3, 1, 2), h, w).transpose(0, 2, 3, 1)
        x = conv(self.dim, "lay4")(x)
        x = nn.relu(x)
        h, w = feats[0].shape[1], feats[0].shape[2]
        x = feats[0] + resize_nearest(x.transpose(0, 3, 1, 2), h, w).transpose(0, 2, 3, 1)
        x = conv(self.dim, "dcn")(x)
        x = nn.relu(x)
        x = conv(self.dim // 4, "lay1")(x)
        x = nn.relu(x)
        x = conv(self.dim // 32, "lay2")(x)
        x = nn.relu(x)
        return x


def run_dynamic_mask_head(
    mask_feats: Array,        # [B, H, W, C_m] stride-8 mask features
    reference_points: Array,  # [B, N, 2] absolute (x, y) in input-image pixels
    params: Array,            # [B, N, num_params] controller outputs
    rel_coord: bool = True,
    mask_feat_stride: int = 8,
    mask_out_stride: int = 4,
) -> Array:
    """Evaluate the dynamic conv stack for N padded instance slots.

    Returns mask logits [B, N, H*up, W*up] at mask_out_stride resolution.
    Reference semantics: dynamic_mask_with_coords (:398) + mask_heads_forward (:377)
    + aligned_bilinear upsample (:616). All convs are 1x1, so each layer is a
    batched einsum over the flattened spatial grid.
    """
    b, h, w, c_m = mask_feats.shape
    n = reference_points.shape[1]
    weight_nums, bias_nums = dynamic_params_layout(c_m, rel_coord)
    ch = DYNAMIC_CHANNELS

    x = mask_feats.reshape(b, h * w, c_m)
    x = jnp.broadcast_to(x[:, None], (b, n, h * w, c_m))
    if rel_coord:
        locations = compute_locations(h, w, stride=mask_feat_stride)  # [HW, 2] (x, y)
        rel = reference_points[:, :, None, :] - locations[None, None, :, :]  # [B,N,HW,2]
        x = jnp.concatenate([rel.astype(x.dtype), x], axis=-1)  # coords first (reference :409)

    # split controller outputs into per-layer weights/biases (static indices)
    import numpy as _np

    split_points = _np.cumsum(weight_nums + bias_nums)[:-1].tolist()
    splits = jnp.split(params, split_points, axis=-1)
    w_splits, b_splits = splits[:CONTROLLER_LAYERS], splits[CONTROLLER_LAYERS:]

    c_in = c_m + (2 if rel_coord else 0)
    dims = [c_in, ch, ch, 1]
    out = x
    for layer in range(CONTROLLER_LAYERS):
        wt = w_splits[layer].reshape(b, n, dims[layer + 1], dims[layer])  # [B,N,out,in]
        bs = b_splits[layer].reshape(b, n, 1, dims[layer + 1])
        out = jnp.einsum("bnsc,bnoc->bnso", out, wt) + bs
        if layer < CONTROLLER_LAYERS - 1:
            out = nn.relu(out)

    logits = out.reshape(b, n, h, w)
    up = mask_feat_stride // mask_out_stride
    if up > 1:
        logits = aligned_bilinear(logits, up)
    return logits
