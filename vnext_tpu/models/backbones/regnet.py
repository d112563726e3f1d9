"""RegNet backbone (capability parity with
detectron2/modeling/backbone/regnet.py: SimpleStem + ResBottleneckBlock AnyNet
with the RegNetX/RegNetY quantized-linear width parameterization; RegNetY adds
squeeze-excitation).

Widths/depths are generated from (w_a, w_0, w_m, depth) exactly as in the
"Designing Network Design Spaces" recipe; group widths are snapped so every
stage width is divisible by its group width."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import FrozenBatchNorm

Array = jnp.ndarray


def generate_regnet_params(
    w_a: float, w_0: int, w_m: float, depth: int, group_width: int, q: int = 8
) -> Tuple[list, list, list]:
    """Per-stage (widths, depths, group_widths) from the RegNet formula."""
    u = w_0 + w_a * np.arange(depth)
    s = np.round(np.log(u / w_0) / np.log(w_m))
    widths = (np.round(w_0 * np.power(w_m, s) / q) * q).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths:
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(int(w))
            stage_depths.append(1)
    gws = [min(group_width, w) for w in stage_widths]
    stage_widths = [int(round(w / g) * g) for w, g in zip(stage_widths, gws)]
    return stage_widths, stage_depths, gws


# (w_a, w_0, w_m, depth, group_width, se) — standard configs
REGNET_CONFIGS = {
    "RegNetX-400MF": (24.48, 24, 2.54, 22, 16, False),
    "RegNetX-1.6GF": (34.01, 80, 2.25, 18, 24, False),
    "RegNetX-4GF": (38.65, 96, 2.43, 23, 40, False),
    "RegNetX-8GF": (49.56, 80, 2.88, 23, 120, False),
    "RegNetY-400MF": (27.89, 48, 2.09, 16, 8, True),
    "RegNetY-1.6GF": (20.71, 48, 2.65, 27, 24, True),
    "RegNetY-4GF": (31.41, 96, 2.24, 22, 64, True),
    "RegNetY-8GF": (76.82, 192, 2.19, 17, 56, True),
}


class SqueezeExcite(nn.Module):
    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class ResBottleneckBlock(nn.Module):
    """1x1 -> grouped 3x3(stride) [-> SE] -> 1x1, bottleneck ratio 1."""

    out_channels: int
    stride: int = 1
    group_width: int = 16
    se_ratio: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        w_b = self.out_channels  # bottleneck ratio 1.0 for all RegNets
        groups = max(w_b // self.group_width, 1)
        kw = dict(use_bias=False, dtype=self.dtype)

        out = nn.Conv(w_b, (1, 1), name="a", **kw)(x)
        out = nn.relu(FrozenBatchNorm(w_b, dtype=self.dtype, name="a_bn")(out))
        out = nn.Conv(w_b, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], feature_group_count=groups,
                      name="b", **kw)(out)
        out = nn.relu(FrozenBatchNorm(w_b, dtype=self.dtype, name="b_bn")(out))
        if self.se_ratio > 0:
            out = SqueezeExcite(max(int(x.shape[-1] * self.se_ratio), 1),
                                dtype=self.dtype, name="se")(out)
        out = nn.Conv(self.out_channels, (1, 1), name="c", **kw)(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="c_bn")(out)

        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride), name="proj", **kw)(x)
            identity = FrozenBatchNorm(self.out_channels, dtype=self.dtype,
                                       name="proj_bn")(identity)
        return nn.relu(out + identity)


class RegNet(nn.Module):
    """4-stage RegNet trunk producing {"res2".."res5"} (strides 4..32), so it
    drops into every place a ResNet feeds an FPN."""

    variant: str = "RegNetX-4GF"
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    stem_channels: int = 32
    dtype: Any = jnp.float32

    @property
    def stage_params(self):
        w_a, w_0, w_m, depth, gw, se = REGNET_CONFIGS[self.variant]
        widths, depths, gws = generate_regnet_params(w_a, w_0, w_m, depth, gw)
        assert len(widths) == 4, f"{self.variant}: got {len(widths)} stages"
        return widths, depths, gws, se

    @property
    def output_channels(self) -> Dict[str, int]:
        widths, _, _, _ = self.stage_params
        return {f"res{i + 2}": w for i, w in enumerate(widths)}

    @property
    def output_strides(self) -> Dict[str, int]:
        return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        widths, depths, gws, se = self.stage_params
        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = nn.relu(FrozenBatchNorm(self.stem_channels, dtype=self.dtype,
                                    name="stem_bn")(x))
        outputs = {}
        for i, (w, d, g) in enumerate(zip(widths, depths, gws)):
            for b in range(d):
                x = ResBottleneckBlock(
                    out_channels=w, stride=2 if b == 0 else 1, group_width=g,
                    se_ratio=0.25 if se else 0.0, dtype=self.dtype,
                    name=f"s{i + 1}_b{b}",
                )(x)
            outputs[f"res{i + 2}"] = x
        return {k: v for k, v in outputs.items() if k in set(self.out_features)}
