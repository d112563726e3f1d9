"""ResNet backbone (flax, NHWC, frozen BN) for detection/VIS.

Capability parity with the reference's torchvision-style ResNet used by IDOL
(idol/models/backbone.py:96 Backbone; detectron2/modeling/backbone/resnet.py for the
core runtime). Bottleneck places the stride on the 3x3 conv (torchvision layout,
stride_in_1x1=False) so torchvision/reference checkpoints import directly.

Returns a dict of NHWC feature maps {"res2", "res3", "res4", "res5"}.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import FrozenBatchNorm
from ...utils.registry import Registry

Array = jnp.ndarray
Dtype = Any

BACKBONE_REGISTRY = Registry("BACKBONE")

_DEPTH_TO_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with residual; frozen BN.

    Options mirror detectron2/modeling/backbone/resnet.py: ``groups`` gives the
    ResNeXt grouped 3x3 (resnet.py:100 BottleneckBlock num_groups),
    ``stride_in_1x1`` moves the stride onto conv1 (MSRA layout), and ``deform``
    swaps the 3x3 for a DCN v1/v2 tap (resnet.py:213 DeformBottleneckBlock).
    """

    mid_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    stride_in_1x1: bool = False
    deform: bool = False
    deform_modulated: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        conv_kwargs = dict(use_bias=False, dtype=self.dtype)
        stride_1x1 = self.stride if self.stride_in_1x1 else 1
        stride_3x3 = 1 if self.stride_in_1x1 else self.stride

        out = nn.Conv(self.mid_channels, (1, 1), strides=(stride_1x1, stride_1x1),
                      name="conv1", **conv_kwargs)(x)
        out = FrozenBatchNorm(self.mid_channels, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)

        d = self.dilation
        if self.deform:
            from ...ops.deform_conv import deform_conv2d

            n_off = 27 if self.deform_modulated else 18
            off = nn.Conv(
                n_off, (3, 3), strides=(stride_3x3, stride_3x3),
                padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="conv2_offset",
            )(out)
            modulation = None
            if self.deform_modulated:
                off, mask = off[..., :18], off[..., 18:]
                modulation = jax.nn.sigmoid(mask)
            weight = self.param(
                "conv2_weight", nn.initializers.he_normal(),
                (3, 3, self.mid_channels, self.mid_channels), self.dtype,
            )
            out = deform_conv2d(out, off, weight, stride=stride_3x3, padding=d,
                                dilation=d, modulation=modulation).astype(out.dtype)
        else:
            out = nn.Conv(
                self.mid_channels,
                (3, 3),
                strides=(stride_3x3, stride_3x3),
                padding=[(d, d), (d, d)],
                kernel_dilation=(d, d),
                feature_group_count=self.groups,
                name="conv2",
                **conv_kwargs,
            )(out)
        out = FrozenBatchNorm(self.mid_channels, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(self.out_channels, (1, 1), name="conv3", **conv_kwargs)(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn3")(out)

        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                name="downsample_conv",
                **conv_kwargs,
            )(x)
            identity = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="downsample_bn")(identity)

        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block for ResNet-18/34
    (reference detectron2/modeling/backbone/resnet.py:100 BasicBlock)."""

    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        conv_kwargs = dict(use_bias=False, dtype=self.dtype)
        out = nn.Conv(self.out_channels, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv1", **conv_kwargs)(x)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                      name="conv2", **conv_kwargs)(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn2")(out)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               name="downsample_conv", **conv_kwargs)(x)
            identity = FrozenBatchNorm(self.out_channels, dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _StemConvParams(nn.Module):
    """Declares the stem conv kernel with nn.Conv's exact name + init, for the
    Pallas-stem branch (which consumes the kernel directly)."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64))


class _StemBNParams(nn.Module):
    """Declares FrozenBatchNorm's param tree for the Pallas-stem branch."""

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (64,))
        b = self.param("bias", nn.initializers.zeros, (64,))
        m = self.param("running_mean", nn.initializers.zeros, (64,))
        v = self.param("running_var", nn.initializers.ones, (64,))
        return w, b, m, v


class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152} trunk producing res2..res5 (NHWC)."""

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    res5_dilation: int = 1
    groups: int = 1                 # ResNeXt cardinality
    width_per_group: int = 64       # ResNeXt bottleneck width
    stride_in_1x1: bool = False
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    dtype: Dtype = jnp.float32

    @property
    def output_strides(self) -> Dict[str, int]:
        s = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
        if self.res5_dilation == 2:
            s["res5"] = 16
        return s

    @property
    def output_channels(self) -> Dict[str, int]:
        if self.depth < 50:  # BasicBlock stages have no 4x expansion
            return {"res2": 64, "res3": 128, "res4": 256, "res5": 512}
        return {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}

    def _pallas_stem_enabled(self, x: Array) -> bool:
        """Fused Pallas stem (ops/stem_conv.py): on for even-sized TPU inputs
        unless VNEXT_PALLAS_STEM=0. On-device A/B (tools/exp_stem.py, 480x864
        T=10): 1.85 ms vs 4.84 XLA conv+bn+relu — the C_in=3 conv runs ~3% MXU
        under XLA's 128-lane channel padding; the banded-patch kernel executes
        336 reduction terms/pixel instead of 6272."""
        import os

        flag = os.environ.get("VNEXT_PALLAS_STEM", "auto")
        if flag == "0":
            return False
        h, w = x.shape[1], x.shape[2]
        ok = x.shape[-1] == 3 and h % 2 == 0 and w % 2 == 0
        if flag == "1":
            return ok
        return ok and jax.default_backend() == "tpu" and self.dtype == jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        blocks = _DEPTH_TO_BLOCKS[self.depth]

        # stem. NOTE (round-4 perf audit): the 7x7/s2 C_in=3 conv is ~8 of the
        # backbone's ~19 ms at 480x864 T=10 (7% MXU) under XLA; the MLPerf
        # space-to-depth rewrite measured SLOWER (10.3 vs 8.2 ms), so the fast
        # path is the fused Pallas stem below; XLA's direct conv is the
        # fallback (odd sizes, non-TPU, VNEXT_PALLAS_STEM=0).
        if self._pallas_stem_enabled(x):
            from ...ops.stem_conv import stem_conv7x7s2_bn_relu

            # declare the SAME param tree as the XLA branch (conv1/kernel,
            # bn1/{weight,bias,running_mean,running_var}) so checkpoints are
            # path-compatible either way, then run the fused kernel
            kernel = _StemConvParams(name="conv1")()
            w_, b_, mean, var = _StemBNParams(name="bn1")()
            inv = w_ * jax.lax.rsqrt(var + 1e-5)
            x = stem_conv7x7s2_bn_relu(
                x, jnp.asarray(kernel, self.dtype), inv, b_ - mean * inv,
                interpret=jax.default_backend() != "tpu",
            ).astype(self.dtype)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                dtype=self.dtype, name="conv1",
            )(x)
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = {}
        basic = self.depth < 50
        # torchvision/ResNeXt bottleneck width: planes * width_per_group/64 * groups
        mid = (64 * self.width_per_group // 64) * self.groups
        out_ch = 64 if basic else 256
        for stage_idx, num_blocks in enumerate(blocks):
            stage_name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            dilation = 1
            if stage_name == "res5" and self.res5_dilation == 2:
                first_stride = 1
                dilation = 2
            for b in range(num_blocks):
                if basic:
                    x = BasicBlock(
                        out_channels=out_ch,
                        stride=first_stride if b == 0 else 1,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{b}",
                    )(x)
                else:
                    x = Bottleneck(
                        mid_channels=mid,
                        out_channels=out_ch,
                        stride=first_stride if b == 0 else 1,
                        dilation=dilation,
                        groups=self.groups,
                        stride_in_1x1=self.stride_in_1x1,
                        deform=self.deform_on_per_stage[stage_idx],
                        deform_modulated=self.deform_modulated,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{b}",
                    )(x)
            outputs[stage_name] = x
            mid *= 2
            out_ch *= 2

        return {k: v for k, v in outputs.items() if k in set(self.out_features) or k in ("res2",)}


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg, dtype=jnp.float32) -> ResNet:
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        dtype=dtype,
    )
