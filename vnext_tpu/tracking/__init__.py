from .idol_tracker import IDOLTracker, mask_iou_matrix, mask_nms_keep
from .idol_tracker_device import TrackerState, init_state, tracker_step

__all__ = [
    "IDOLTracker",
    "mask_iou_matrix",
    "mask_nms_keep",
    "TrackerState",
    "init_state",
    "tracker_step",
]
