from .train_step import TrainState, make_train_step
from .vis_inference import IDOLVideoInference

__all__ = ["TrainState", "make_train_step", "IDOLVideoInference"]
