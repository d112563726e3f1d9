"""Model zoo: config-path -> (config, weights) mapping.

Capability parity with detectron2/model_zoo/model_zoo.py:12-180 (get_config_file,
get_checkpoint_url, get). Weight URLs point at the reference's released IDOL
checkpoints (their .pth files import via checkpoint/torch_import.py); local paths
override via $VNEXT_WEIGHTS.
"""

from __future__ import annotations

import os
from typing import Optional

_CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "configs")

# reference release checkpoints (projects/IDOL/IDOL.md model zoo tables)
_WEIGHTS = {
    "idol/ytvis19_r50.yaml": "IDOL_YTVIS19_R50.pth",
    "idol/ytvis19_r101.yaml": "IDOL_YTVIS19_R101.pth",
    "idol/ytvis19_swinL.yaml": "IDOL_YTVIS19_SWINL.pth",
    "idol/ytvis21_r50.yaml": "IDOL_YTVIS21_R50.pth",
    "idol/ytvis21_r101.yaml": "IDOL_YTVIS21_R101.pth",
    "idol/ovis_r50.yaml": "IDOL_OVIS_R50.pth",
    "idol/ovis_swinL.yaml": "IDOL_OVIS_SWINL.pth",
    "idol/ytvis21_swinL.yaml": "IDOL_YTVIS21_SWINL.pth",
    # SeqFormer zoo is "in preparation" upstream (SeqFormer.md); MinVIS+motion
    # checkpoints from projects/InstMove/InstMove.md
    "minvis/ovis_r50.yaml": "MINVIS_OVIS_R50.pth",
    "minvis/ovis_r50_motion.yaml": "MINVIS_MOTION_OVIS_R50.pth",
}


def get_config_file(config_path: str) -> str:
    path = os.path.join(_CONFIG_ROOT, config_path)
    if not os.path.exists(path):
        raise RuntimeError(f"{config_path} not available in model zoo ({path})")
    return os.path.abspath(path)


def get_checkpoint_url(config_path: str) -> str:
    if config_path not in _WEIGHTS:
        raise RuntimeError(f"No pretrained weights registered for {config_path}")
    root = os.environ.get("VNEXT_WEIGHTS", "weights")
    return os.path.join(root, _WEIGHTS[config_path])


def get_config(config_path: str, trained: bool = False):
    from ..config import (
        add_idol_config,
        add_maskformer_config,
        add_seqformer_config,
        get_cfg,
    )

    cfg = get_cfg()
    if config_path.startswith("minvis"):
        add_maskformer_config(cfg)
    else:
        add_idol_config(cfg)
        try:
            add_seqformer_config(cfg)
        except Exception:
            pass
    cfg.merge_from_file(get_config_file(config_path))
    if trained:
        cfg.MODEL.WEIGHTS = get_checkpoint_url(config_path)
    return cfg


def list_configs():
    """All config paths with registered pretrained weights."""
    return sorted(_WEIGHTS)


def get(config_path: str, trained: bool = False, init: bool = True):
    """Build the model for a zoo config; loads weights when trained=True.

    init=False returns (model, None, cfg) without initializing parameters —
    cheap enough to smoke-test every zoo entry."""
    import jax
    import jax.numpy as jnp

    from ..checkpoint.checkpointer import load_weights
    from ..models import build_model
    from ..models.idol import IDOL

    cfg = get_config(config_path, trained)
    model = build_model(cfg)
    if not init:
        return model, None, cfg
    h, w = cfg.TPU.TEST_IMAGE_SIZE
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
        method=type(model).inference,
    )["params"]
    if trained and cfg.MODEL.WEIGHTS and os.path.exists(cfg.MODEL.WEIGHTS):
        params = load_weights(cfg.MODEL.WEIGHTS, params)
    return model, params, cfg
