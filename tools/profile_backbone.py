#!/usr/bin/env python
"""ResNet-50 backbone timing at eval shapes — is the 864 width hurting XLA?

Chained-scan timing (remote-TPU safe) at the bench resolution vs 128-aligned
variants, f32 vs bf16 input, to see whether padding/layout buys anything.
"""
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models.backbones.resnet import ResNet

T = 10


def bench(h, w, dtype):
    model = ResNet(depth=50, out_features=("res3", "res4", "res5"), dtype=dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(T, h, w, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x)["params"])()

    @jax.jit
    def run(x):
        def body(carry, _):
            out = model.apply({"params": params}, carry)["res5"]
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry + fb * jnp.ones_like(carry)[..., :1].mean(), jnp.sum(
                out.astype(jnp.float32)
            )

        final, s = jax.lax.scan(body, x, None, length=6)
        return jnp.sum(s)

    t0 = time.time(); float(run(x)); ct = time.time() - t0
    t0 = time.time(); float(run(x)); rt = time.time() - t0
    print(f"R50 {h}x{w} {jnp.dtype(dtype).name:9s} {rt / 6 * 1000:7.1f} ms/10f (compile {ct:.0f}s)",
          flush=True)


def main():
    bench(480, 864, jnp.bfloat16)
    bench(512, 896, jnp.bfloat16)   # 128-aligned W
    bench(480, 864, jnp.float32)


if __name__ == "__main__":
    main()
