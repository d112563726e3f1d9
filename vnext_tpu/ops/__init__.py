from .interpolate import (
    aligned_bilinear,
    compute_locations,
    resize_bilinear,
    resize_bilinear_ac,
    resize_nearest,
)
from .hungarian import auction_lap, hungarian, hungarian_match
from .losses import dice_loss, sigmoid_bce_with_logits, sigmoid_focal_loss, sigmoid_focal_loss_elementwise
from .mask_ops import paste_masks_in_image
from .ms_deform_attn import (
    ms_deform_attn,
    ms_deform_attn_core_jnp,
    ms_deform_attn_factorized_xla,
)
from .nms import batched_nms_mask, mask_nms_keep, nms_mask
from .roi_align import roi_align

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
    "ms_deform_attn_factorized_xla",
    "batched_nms_mask",
    "mask_nms_keep",
    "nms_mask",
    "hungarian",
    "hungarian_match",
    "auction_lap",
    "paste_masks_in_image",
    "roi_align",
]

from .deform_conv import deform_conv2d  # noqa: E402
from .roi_align_rotated import roi_align_rotated  # noqa: E402
from .rotated_boxes import nms_rotated_mask, pairwise_iou_rotated  # noqa: E402

__all__ += ["deform_conv2d", "roi_align_rotated", "nms_rotated_mask", "pairwise_iou_rotated"]
