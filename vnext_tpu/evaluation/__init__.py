from .rle import rle_area, rle_decode, rle_encode, rle_iou
from .ytvis_eval import DatasetEvaluator, YTVISEvaluator, build_evaluator
from .ytvos_eval import YTVOSeval, tube_iou

__all__ = [
    "rle_area",
    "rle_decode",
    "rle_encode",
    "rle_iou",
    "DatasetEvaluator",
    "YTVISEvaluator",
    "build_evaluator",
    "YTVOSeval",
    "tube_iou",
]
