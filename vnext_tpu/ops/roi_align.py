"""ROIAlign (jnp, matmul-based bilinear sampling).

Capability parity with detectron2/layers/roi_align.py (torchvision roi_align with
aligned=True): for each ROI, each output bin averages sampling_ratio^2 bilinear
samples. TPU-first form: per-ROI separable row/column interpolation matrices turn
the whole pooling into two einsums (no gathers).

Suitable for ROI-head workloads (N ROIs x 7x7/14x14 bins); per-ROI feature
gathering broadcasts the image's feature map over its ROIs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _axis_weights(starts: Array, bin_size: Array, n_bins: int, s: int, size: int) -> Array:
    """[N, n_bins*s, size] bilinear weights for one axis.

    starts: [N] roi start coordinate (already scaled + aligned); bin_size: [N].
    Sample positions: start + (bin + (j+0.5)/s) * bin_size.
    """
    n = starts.shape[0]
    bin_idx = jnp.arange(n_bins, dtype=jnp.float32)[:, None]
    sub = (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s
    offs = (bin_idx + sub).reshape(-1)  # [n_bins*s]
    pos = starts[:, None] + offs[None, :] * bin_size[:, None]  # [N, n_bins*s]
    # bilinear weights with edge clamping (torchvision: x <= -1 or >= size -> 0;
    # otherwise clamp into [0, size-1])
    valid = (pos > -1.0) & (pos < size)
    pc = jnp.clip(pos, 0.0, size - 1.0)
    lo = jnp.floor(pc)
    frac = pc - lo
    grid = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    w = (
        jnp.where(grid == lo[..., None], 1.0 - frac[..., None], 0.0)
        + jnp.where(grid == jnp.minimum(lo + 1, size - 1)[..., None], frac[..., None], 0.0)
    )
    # when lo == size-1, frac==0 so the duplicate index contributes 0... except
    # exactly at the edge where lo+1 == lo: ensure total weight 1
    w = jnp.where(valid[..., None], w, 0.0)
    return w


def _roi_weights(rois4, out_h, out_w, s, h, w, spatial_scale, aligned):
    offset = 0.5 if aligned else 0.0
    x1 = rois4[:, 0] * spatial_scale - offset
    y1 = rois4[:, 1] * spatial_scale - offset
    x2 = rois4[:, 2] * spatial_scale - offset
    y2 = rois4[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    wy = _axis_weights(y1, roi_h / out_h, out_h, s, h)  # [N, out_h*s, H]
    wx = _axis_weights(x1, roi_w / out_w, out_w, s, w)  # [N, out_w*s, W]
    return wy, wx


def roi_align_per_item(
    bank: Array,            # [M, H, W] single-channel bank (e.g. GT bitmasks)
    rois4: Array,           # [N, 4] xyxy in bank coords
    item_idx: Array,        # [N] int — each ROI samples bank[item_idx]
    output_size: Tuple[int, int] = (28, 28),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    chunk: int = 32,
) -> Array:
    """Diagonal ROIAlign: ROI i pools from its OWN bank item (the mask-target
    crop of mask_rcnn_loss). O(N*qh*H*W) — routing this through the generic
    pooler's batch one-hot would cost M/qh times more (M=B*K items)."""
    m, h, w = bank.shape
    out_h, out_w = output_size
    s = max(sampling_ratio, 1)
    wy, wx = _roi_weights(rois4, out_h, out_w, s, h, w, spatial_scale, aligned)

    n = rois4.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        wy = jnp.pad(wy, ((0, n_pad - n), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, n_pad - n), (0, 0), (0, 0)))
        item_idx = jnp.pad(item_idx, (0, n_pad - n))
    g = n_pad // chunk

    def one_chunk(args):
        wy_c, wx_c, idx_c = args
        bk = bank[idx_c]                                   # [chunk, H, W]
        t = jnp.einsum("nqh,nhw->nqw", wy_c, bk)
        return jnp.einsum("npw,nqw->nqp", wx_c, t)         # [chunk, qh, qw]

    o = jax.lax.map(one_chunk, (wy.reshape(g, chunk, out_h * s, h),
                                wx.reshape(g, chunk, out_w * s, w),
                                item_idx.reshape(g, chunk)))
    o = o.reshape(n_pad, out_h * s, out_w * s)[:n]
    return o.reshape(n, out_h, s, out_w, s).mean(axis=(2, 4))


def roi_align(
    features: Array,        # [B, H, W, C]
    rois: Array,            # [N, 5]: (batch_idx, x1, y1, x2, y2) in image coords
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> Array:
    """Returns [N, out_h, out_w, C]."""
    b, h, w, c = features.shape
    out_h, out_w = output_size
    s = max(sampling_ratio, 1)

    batch_idx = rois[:, 0].astype(jnp.int32)
    wy, wx = _roi_weights(rois[:, 1:5], out_h, out_w, s, h, w, spatial_scale, aligned)

    # Fold the ROI->image selection into the row weights (one-hot over B), so
    # the H contraction is a plain dot against the flattened [B*H, W*C] map —
    # never materializing a per-ROI copy of the features (a naive
    # features[batch_idx] broadcast is O(N*H*W*C): 18 GB at COCO eval shapes).
    n = rois.shape[0]
    qh, qw = out_h * s, out_w * s
    onehot = jax.nn.one_hot(batch_idx, b, dtype=wy.dtype)          # [N, B]
    wyb = (wy[:, :, None, :] * onehot[:, None, :, None]).reshape(n, qh, b * h)
    fm = features.reshape(b * h, w * c)

    # chunk over ROIs to bound the [chunk, qh, W, C] intermediate
    chunk = 64
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        wyb = jnp.pad(wyb, ((0, n_pad - n), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, n_pad - n), (0, 0), (0, 0)))
    wyb = wyb.reshape(n_pad // chunk, chunk, qh, b * h)
    wxc = wx.reshape(n_pad // chunk, chunk, qw, w)

    def one_chunk(args):
        wyb_c, wx_c = args
        t = (wyb_c.reshape(chunk * qh, b * h) @ fm).reshape(chunk, qh, w, c)
        return jnp.einsum("npw,nqwc->nqpc", wx_c, t)               # [chunk, qh, qw, C]

    o = jax.lax.map(one_chunk, (wyb, wxc))
    o = o.reshape(n_pad, qh, qw, c)[:n]
    o = o.reshape(n, out_h, s, out_w, s, c).mean(axis=(2, 4))
    return o
