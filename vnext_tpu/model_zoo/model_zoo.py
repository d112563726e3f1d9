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

# reference release checkpoints: the actual published URLs from the reference
# model-zoo tables (projects/IDOL/IDOL.md:33-55, projects/InstMove/InstMove.md:24)
_HF_IDOL = "https://huggingface.co/QHL067/VNext_ECCV/resolve/main/IDOL"
_HF_INSTMOVE = "https://huggingface.co/Junfeng5/InstMove/resolve/main"
_WEIGHTS = {
    "idol/ytvis19_r50.yaml": f"{_HF_IDOL}/YTVIS19_R50_502AP.pth",
    "idol/ytvis19_r101.yaml": f"{_HF_IDOL}/YTVIS19_R101_501AP.pth",
    "idol/ytvis19_swinL.yaml": f"{_HF_IDOL}/YTVIS19_SWINL_639AP-003.pth",
    "idol/ytvis21_r50.yaml": f"{_HF_IDOL}/YTVIS21_R50_478AP.pth",
    "idol/ytvis21_r101.yaml": f"{_HF_IDOL}/YTVIS21_R101_485AP.pth",
    "idol/ytvis21_swinL.yaml": f"{_HF_IDOL}/YTVIS21_SwinL_608AP-002.pth",
    "idol/ovis_r50.yaml": f"{_HF_IDOL}/OVIS_R50_294AP.pth",
    "idol/ovis_swinL.yaml": f"{_HF_IDOL}/OVIS_SwinL_414AP.pth",
    # COCO pretrain checkpoints (IDOL.md:23-25)
    "idol/coco_pretrain/r50_coco_sequence.yaml": f"{_HF_IDOL}/cocopretrain_R50.pth",
    "idol/coco_pretrain/swin_coco_sequence.yaml": f"{_HF_IDOL}/cocopretrain_SWINL.pth",
    # SeqFormer zoo is "in preparation" upstream (SeqFormer.md); MinVIS+motion
    # checkpoints from projects/InstMove/InstMove.md:24
    "minvis/ovis_r50.yaml": f"{_HF_INSTMOVE}/minvis_ovis_R50.pth",
    "minvis/ovis_r50_motion.yaml": f"{_HF_INSTMOVE}/minvis_ovis_R50.pth",
}


def get_config_file(config_path: str) -> str:
    path = os.path.join(_CONFIG_ROOT, config_path)
    if not os.path.exists(path):
        raise RuntimeError(f"{config_path} not available in model zoo ({path})")
    return os.path.abspath(path)


def get_checkpoint_url(config_path: str) -> str:
    """The published release URL for this config (reference model-zoo tables)."""
    if config_path not in _WEIGHTS:
        raise RuntimeError(f"No pretrained weights registered for {config_path}")
    return _WEIGHTS[config_path]


def _cache_dir() -> str:
    return os.environ.get(
        "VNEXT_WEIGHTS", os.path.join(os.path.expanduser("~"), ".vnext", "weights")
    )


def resolve_checkpoint(config_path: str, download: bool = True) -> Optional[str]:
    """Local path for a zoo checkpoint: $VNEXT_WEIGHTS cache first, else
    download from the release URL (mirrors detectron2's PathManager resolve,
    model_zoo.py:111-147). Returns None when the file is absent and the
    download fails (e.g. offline) — callers decide whether that is fatal."""
    url = get_checkpoint_url(config_path)
    local = os.path.join(_cache_dir(), os.path.basename(url))
    if os.path.exists(local):
        return local
    if not download:
        return None
    try:
        import urllib.request

        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = local + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, local)
        return local
    except Exception:
        return None


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
        local = resolve_checkpoint(config_path, download=False)
        cfg.MODEL.WEIGHTS = local or get_checkpoint_url(config_path)
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
    if trained:
        local = resolve_checkpoint(config_path)  # cache hit or download
        if local is None:
            raise RuntimeError(
                f"weights for {config_path} are not cached in {_cache_dir()} and "
                f"the download from {get_checkpoint_url(config_path)} failed "
                "(offline?). Fetch the file manually into $VNEXT_WEIGHTS."
            )
        params = load_weights(local, params)
    return model, params, cfg
