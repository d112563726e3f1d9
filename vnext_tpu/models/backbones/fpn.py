"""Feature Pyramid Network (flax, NHWC).

Capability parity with detectron2/modeling/backbone/fpn.py (FPN: lateral 1x1 +
3x3 output convs + nearest top-down pathway; LastLevelMaxPool / LastLevelP6P7
extra blocks)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.interpolate import resize_nearest

Array = jnp.ndarray


class FPN(nn.Module):
    """Builds {p2..p5(+p6,p7)} from bottom-up features {res2..res5}."""

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    top_block: str = "maxpool"  # 'maxpool' (p6) | 'p6p7' | 'none'
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, Array]) -> Dict[str, Array]:
        feats = [bottom_up[f] for f in self.in_features]  # fine -> coarse
        c = self.out_channels
        lateral = [
            nn.Conv(c, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(feats)
        ]
        # top-down
        results: List[Array] = [None] * len(lateral)
        prev = lateral[-1]
        results[-1] = prev
        for i in range(len(lateral) - 2, -1, -1):
            h, w = lateral[i].shape[1:3]
            up = resize_nearest(prev.transpose(0, 3, 1, 2), h, w).transpose(0, 2, 3, 1)
            prev = lateral[i] + up
            if self.fuse_type == "avg":
                prev = prev / 2
            results[i] = prev
        outputs = {}
        base_level = int(self.in_features[0][-1])  # 'res3' -> 3
        for i, x in enumerate(results):
            out = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name=f"output_{i}")(x)
            outputs[f"p{base_level + i}"] = out

        top_level = base_level + len(results) - 1
        if self.top_block == "maxpool":
            outputs[f"p{top_level + 1}"] = nn.max_pool(
                outputs[f"p{top_level}"], (1, 1), strides=(2, 2)
            )
        elif self.top_block == "p6p7":
            p6 = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype,
                         name="p6")(bottom_up[self.in_features[-1]])
            p7 = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype,
                         name="p7")(nn.relu(p6))
            outputs[f"p{top_level + 1}"] = p6
            outputs[f"p{top_level + 2}"] = p7
        return outputs
