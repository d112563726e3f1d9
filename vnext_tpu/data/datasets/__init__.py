from .cityscapes import (
    load_cityscapes_instances,
    load_cityscapes_semantic,
    register_cityscapes,
)
from .coco_panoptic import (
    id2rgb,
    load_coco_panoptic_json,
    register_coco_panoptic,
    rgb2id,
)
from .lvis import load_lvis_json, register_lvis_instances
from .pascal_voc import load_voc_instances, register_pascal_voc

__all__ = [
    "load_cityscapes_instances",
    "load_cityscapes_semantic",
    "register_cityscapes",
    "load_coco_panoptic_json",
    "register_coco_panoptic",
    "rgb2id",
    "id2rgb",
    "load_lvis_json",
    "register_lvis_instances",
    "load_voc_instances",
    "register_pascal_voc",
]
