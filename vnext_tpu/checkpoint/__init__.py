from .torch_import import (
    apply_to_params,
    convert_idol_checkpoint,
    load_idol_weights,
    load_torch_state_dict,
)

__all__ = [
    "apply_to_params",
    "convert_idol_checkpoint",
    "load_idol_weights",
    "load_torch_state_dict",
]
