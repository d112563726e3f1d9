from .build import build_lr_schedule, build_optimizer, backbone_mask, frozen_mask

__all__ = ["build_lr_schedule", "build_optimizer", "backbone_mask", "frozen_mask"]
