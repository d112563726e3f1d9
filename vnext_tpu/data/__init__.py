from . import augmentation as augmentations  # policy API (T.* analogue)
from . import transforms
from .augmentation import AugInput, Augmentation, AugmentationList, apply_augmentations, build_idol_augmentation
from .catalog import DatasetCatalog, Metadata, MetadataCatalog
from .build import (
    InferenceSampler,
    PrefetchIterator,
    TrainingSampler,
    build_vis_test_loader,
    build_vis_train_loader,
)
from .coco_clip_mapper import CocoClipDatasetMapper
from .dataset_mapper import YTVISDatasetMapper
from .datasets.coco import load_coco_json, register_all_coco, register_coco_instances
from .datasets.ytvis import (
    OVIS_CLASSES,
    YTVIS_2019_CLASSES,
    YTVIS_2021_CLASSES,
    load_ytvis_json,
    register_all_ytvis,
    register_ytvis_instances,
)

__all__ = [
    "AugInput",
    "Augmentation",
    "AugmentationList",
    "apply_augmentations",
    "augmentations",
    "build_idol_augmentation",
    "transforms",
    "DatasetCatalog",
    "Metadata",
    "MetadataCatalog",
    "InferenceSampler",
    "PrefetchIterator",
    "TrainingSampler",
    "build_vis_test_loader",
    "build_vis_train_loader",
    "YTVISDatasetMapper",
    "CocoClipDatasetMapper",
    "load_coco_json",
    "register_all_coco",
    "register_coco_instances",
    "OVIS_CLASSES",
    "YTVIS_2019_CLASSES",
    "YTVIS_2021_CLASSES",
    "load_ytvis_json",
    "register_all_ytvis",
    "register_ytvis_instances",
]
