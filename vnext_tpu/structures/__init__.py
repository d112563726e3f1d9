from .boxes import (
    BoxMode,
    Boxes,
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    clip_boxes,
    elementwise_giou_loss,
    generalized_box_iou,
    nonempty_boxes,
    pairwise_intersection,
    pairwise_iou,
)
from .instances import Instances
from .masks import (
    BitMasks,
    PolygonMasks,
    ROIMasks,
    mask_iou_pairwise,
    polygon_area,
    polygons_to_bitmask,
    rasterize_polygons_within_box,
)
from .image_list import ImageList

__all__ = [
    "BoxMode",
    "Boxes",
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_iou",
    "box_xyxy_to_cxcywh",
    "clip_boxes",
    "elementwise_giou_loss",
    "generalized_box_iou",
    "nonempty_boxes",
    "pairwise_intersection",
    "pairwise_iou",
    "Instances",
    "BitMasks",
    "mask_iou_pairwise",
    "polygons_to_bitmask",
    "ImageList",
]

from .boxes import RotatedBoxes  # noqa: E402

__all__.append("RotatedBoxes")
