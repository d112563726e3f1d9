from .cfgnode import CfgNode, CN
from .configurable import auto_scale_workers, configurable
from .defaults import get_cfg
from .extensions import add_idol_config, add_maskformer_config, add_seqformer_config
from .lazy import LazyCall, LazyConfig, instantiate

__all__ = [
    "CfgNode",
    "configurable",
    "auto_scale_workers",
    "CN",
    "get_cfg",
    "add_idol_config",
    "add_maskformer_config",
    "add_seqformer_config",
    "LazyCall",
    "LazyConfig",
    "instantiate",
]
