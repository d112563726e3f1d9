"""Backbone factory shared by the detection/VIS meta-architectures.

The reference selects backbones via cfg.MODEL.BACKBONE.NAME (detectron2
build_backbone; IDOL's Swin is registered as "D2SwinTransformer",
projects/IDOL/idol/backbone/swin.py:684). Here the same switch is a plain
constructor so model modules stay explicit flax dataclasses.
"""

from typing import Any, Sequence, Tuple

from .resnet import ResNet
from .swin import SwinTransformer

# (embed_dim, depths, num_heads, window_size, drop_path_rate) presets matching
# the reference configs (swin.py:608-683 tiny/small/base/large init tables)
SWIN_PRESETS = {
    "T": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7, 0.2),
    "S": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7, 0.2),
    "B": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12, 0.3),
    "L": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12, 0.3),
}


def make_backbone(
    backbone_type: str,
    *,
    depth: int = 50,
    stride_in_1x1: bool = False,
    out_features: Sequence[str] = ("res3", "res4", "res5"),
    swin: Tuple = SWIN_PRESETS["L"],
    dtype: Any,
    name: str = "backbone",
):
    """backbone_type: "resnet" | "swin". ``swin`` is the preset tuple above."""
    if backbone_type == "swin":
        embed_dim, depths, num_heads, window_size, drop_path = swin
        return SwinTransformer(
            embed_dim=embed_dim,
            depths=tuple(depths),
            num_heads=tuple(num_heads),
            window_size=window_size,
            drop_path_rate=drop_path,
            out_features=tuple(out_features),
            dtype=dtype,
            name=name,
        )
    if backbone_type != "resnet":
        raise ValueError(f"unknown backbone_type {backbone_type!r}")
    return ResNet(
        depth=depth,
        out_features=tuple(out_features),
        stride_in_1x1=stride_in_1x1,
        dtype=dtype,
        name=name,
    )


def backbone_kwargs_from_cfg(cfg) -> dict:
    """Model-constructor kwargs for the cfg's backbone selection.

    Mirrors the reference's cfg.MODEL.BACKBONE.NAME switch: any name
    containing "Swin"/"swin" selects the Swin backbone configured by
    cfg.MODEL.SWIN.*; everything else is the ResNet family (MODEL.RESNETS).
    """
    name = cfg.MODEL.BACKBONE.NAME
    if "swin" in name.lower():
        s = cfg.MODEL.SWIN
        return {
            "backbone_type": "swin",
            "swin": (
                s.EMBED_DIM,
                tuple(s.DEPTHS),
                tuple(s.NUM_HEADS),
                s.WINDOW_SIZE,
                s.DROP_PATH_RATE,
            ),
        }
    return {
        "backbone_type": "resnet",
        "backbone_depth": cfg.MODEL.RESNETS.DEPTH,
    }
