from .launch import launch
from .train_step import TrainState, make_train_step
from .vis_inference import IDOLVideoInference

__all__ = ["launch", "TrainState", "make_train_step", "IDOLVideoInference"]
