from .idol_tracker import IDOLTracker, mask_iou_matrix, mask_nms_keep

__all__ = ["IDOLTracker", "mask_iou_matrix", "mask_nms_keep"]
