#!/usr/bin/env python
"""Cumulative per-stage ResNet-50 timing at eval shapes (chained-scan, axon-safe).

Differences between cumulative stages give per-stage cost: stem (7x7 s2 conv +
BN + relu + maxpool) vs res2..res5 — locates the backbone's distance from
speed-of-light (~340 GF/clip bf16 => ~3.5 ms at 50% MXU).
"""
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models.backbones.resnet import ResNet

T, H, W = 10, 480, 864
REPS = int(os.environ.get("REPS", "6"))


import flax.linen as nn
from vnext_tpu.models.layers import FrozenBatchNorm


class _Stem(nn.Module):
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def bench(stage, dtype=jnp.bfloat16):
    x = jnp.asarray(np.random.RandomState(0).randn(T, H, W, 3), jnp.float32)
    if stage == "stem":
        model = _Stem(dtype=dtype)
        params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x)["params"])()

        def run_stage(p, inp):
            return model.apply({"params": p}, inp)
    else:
        model = ResNet(depth=50, out_features=(stage,), dtype=dtype)
        params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x)["params"])()

        def run_stage(p, inp):
            return model.apply({"params": p}, inp)[stage]

    @jax.jit
    def run(x):
        def body(carry, _):
            out = run_stage(params, carry)
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry + fb * jnp.ones_like(carry)[..., :1].mean(), jnp.sum(
                out.astype(jnp.float32)
            )

        final, s = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(s)

    t0 = time.time(); float(run(x)); ct = time.time() - t0
    t0 = time.time(); float(run(x)); rt = time.time() - t0
    print(f"{stage:6s} {rt / REPS * 1000:7.1f} ms/10f (compile {ct:.0f}s)", flush=True)
    return rt / REPS * 1000


def main():
    prev = 0.0
    for stage in ("stem", "res2", "res3", "res4", "res5"):
        cur = bench(stage)
        print(f"       -> +{cur - prev:.1f} ms")
        prev = cur


if __name__ == "__main__":
    main()
