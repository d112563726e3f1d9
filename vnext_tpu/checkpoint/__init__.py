from .torch_import import (
    apply_to_params,
    convert_idol_checkpoint,
    convert_minvis_checkpoint,
    convert_seqformer_checkpoint,
    detect_checkpoint_family,
    load_idol_weights,
    load_reference_weights,
    load_torch_state_dict,
)

__all__ = [
    "apply_to_params",
    "convert_idol_checkpoint",
    "convert_minvis_checkpoint",
    "convert_seqformer_checkpoint",
    "detect_checkpoint_family",
    "load_idol_weights",
    "load_reference_weights",
    "load_torch_state_dict",
]
