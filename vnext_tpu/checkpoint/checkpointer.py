"""Checkpoint save/resume.

Capability parity with detectron2/checkpoint/detection_checkpoint.py:15
(DetectionCheckpointer): periodic full-state checkpoints (params + optimizer +
iteration), a ``last_checkpoint`` marker file, ``resume_or_load`` semantics, and
a reference-.pth import path (torch_import.py) replacing the c2 key remapper.

Storage backend is orbax (sharded, async-capable) — the TPU-native equivalent of
torch.save.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax

logger = logging.getLogger("vnext_tpu")

LAST_CHECKPOINT_FILE = "last_checkpoint"


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.PyTreeCheckpointer()

    # -------------------------------------------------------------- core IO
    def save(self, name: str, state: Any) -> str:
        path = os.path.join(self.save_dir, name)
        self._mgr.save(path, state, force=True)
        with open(os.path.join(self.save_dir, LAST_CHECKPOINT_FILE), "w") as f:
            f.write(name)
        logger.info("Saved checkpoint to %s", path)
        return path

    def load(self, path: str, template: Optional[Any] = None) -> Any:
        if template is not None:
            restore_args = self._ocp.checkpoint_utils.construct_restore_args(template)
            return self._mgr.restore(
                path, restore_args=restore_args, item=template
            )
        return self._mgr.restore(path)

    # -------------------------------------------------------------- protocol
    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, LAST_CHECKPOINT_FILE))

    def get_checkpoint_file(self) -> Optional[str]:
        marker = os.path.join(self.save_dir, LAST_CHECKPOINT_FILE)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        return os.path.join(self.save_dir, name)

    def resume_or_load(self, weights_path: str, state_template: Any, resume: bool = True):
        """Return (state, start_iter).

        resume & checkpoint exists -> restore full trainer state;
        else -> load model weights only (.pth reference checkpoints supported).
        """
        if resume and self.has_checkpoint():
            path = self.get_checkpoint_file()
            logger.info("Resuming from %s", path)
            state = self.load(path, template=state_template)
            return state, int(jax.device_get(state.step))
        if weights_path:
            params = load_weights(weights_path, state_template.params)
            state = state_template.replace(params=params)
            return state, 0
        return state_template, 0


def load_weights(path: str, params_template: Any):
    """Load model weights from an orbax dir or a reference .pth file."""
    if path.endswith((".pth", ".pkl", ".pt")):
        from .torch_import import load_reference_weights

        new_params, report = load_reference_weights(path, params_template)
        logger.info(
            "Imported torch weights: %d matched, %d missing, %d unused, %d shape-mismatched",
            report["matched"], len(report["missing"]), len(report["unused"]),
            len(report["shape_mismatch"]),
        )
        return new_params
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restore_args = ocp.checkpoint_utils.construct_restore_args(params_template)
    restored = ckptr.restore(path, restore_args=restore_args, item=params_template)
    # support both raw params dirs and full TrainState dirs
    return restored.params if hasattr(restored, "params") else restored
