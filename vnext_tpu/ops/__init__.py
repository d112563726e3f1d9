from .interpolate import (
    aligned_bilinear,
    compute_locations,
    resize_bilinear,
    resize_bilinear_ac,
    resize_nearest,
)
from .losses import dice_loss, sigmoid_bce_with_logits, sigmoid_focal_loss, sigmoid_focal_loss_elementwise
from .ms_deform_attn import ms_deform_attn, ms_deform_attn_core_jnp
from .nms import batched_nms_mask, mask_nms_keep, nms_mask

__all__ = [
    "aligned_bilinear",
    "compute_locations",
    "resize_bilinear",
    "resize_bilinear_ac",
    "resize_nearest",
    "dice_loss",
    "sigmoid_bce_with_logits",
    "sigmoid_focal_loss",
    "sigmoid_focal_loss_elementwise",
    "ms_deform_attn",
    "ms_deform_attn_core_jnp",
    "batched_nms_mask",
    "mask_nms_keep",
    "nms_mask",
]
