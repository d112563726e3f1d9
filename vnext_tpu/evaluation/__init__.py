from .cityscapes_eval import CityscapesInstanceEvaluator, CityscapesSemSegEvaluator
from .coco_eval import COCOEvaluator
from .evaluator import DatasetEvaluators, inference_on_dataset
from .lvis_eval import LVISEvaluator
from .panoptic_eval import COCOPanopticEvaluator, pq_single_image
from .pascal_voc_eval import PascalVOCDetectionEvaluator, voc_ap
from .rle import rle_area, rle_decode, rle_encode, rle_iou
from .rotated_coco_eval import RotatedCOCOEvaluator
from .sem_seg_eval import SemSegEvaluator
from .testing import flatten_results_dict, verify_final_loss, verify_results
from .ytvis_eval import DatasetEvaluator, YTVISEvaluator, build_evaluator
from .ytvos_eval import YTVOSeval, tube_iou

__all__ = [
    "rle_area",
    "rle_decode",
    "rle_encode",
    "rle_iou",
    "DatasetEvaluator",
    "DatasetEvaluators",
    "inference_on_dataset",
    "COCOEvaluator",
    "RotatedCOCOEvaluator",
    "CityscapesInstanceEvaluator",
    "CityscapesSemSegEvaluator",
    "LVISEvaluator",
    "COCOPanopticEvaluator",
    "pq_single_image",
    "PascalVOCDetectionEvaluator",
    "voc_ap",
    "SemSegEvaluator",
    "YTVISEvaluator",
    "build_evaluator",
    "verify_results",
    "verify_final_loss",
    "flatten_results_dict",
    "YTVOSeval",
    "tube_iou",
]
