from .cfgnode import CfgNode, CN
from .defaults import get_cfg
from .lazy import LazyCall, LazyConfig, instantiate

__all__ = ["CfgNode", "CN", "get_cfg", "LazyCall", "LazyConfig", "instantiate"]
