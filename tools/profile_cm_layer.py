#!/usr/bin/env python
"""A/B an encoder layer: standard vs channel-major, on TPU at eval shapes.

Chained-scan timing (see profile_chained2.py) over one EncoderLayer with
real-model-shaped inputs (10 frames folded into batch, 480x864 levels).
Also times the bare MSDA module both ways to separate module overhead from
the FFN/LN tail.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vnext_tpu.models.deformable_transformer import (
    EncoderLayer,
    MSDeformAttnModule,
    encoder_reference_points,
)

T = 10
SHAPES = ((60, 108), (30, 54), (15, 27), (8, 14))
C, M, P = 256, 8, 4
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)
N = int(os.environ.get("REPS", "8"))


def chained(make_fn, x0, name):
    @jax.jit
    def run(x):
        def body(carry, _):
            out = make_fn(carry)
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-9).astype(carry.dtype)
            return carry + fb, jnp.sum(out).astype(jnp.float32)

        final, ss = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(ss)

    t0 = time.time()
    float(run(x0))
    ct = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        float(run(x0))
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts) / N * 1000:8.2f} ms/iter (compile {ct:.0f}s)", flush=True)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    src = jnp.asarray(rng.randn(T, S, C), dt)
    pos = jnp.asarray(rng.randn(T, S, C), dt)
    vr = jnp.ones((T, L, 2), jnp.float32)
    ref = encoder_reference_points(SHAPES, vr)  # [T, S, L, 2]
    mask = jnp.zeros((T, S), bool)

    layer = EncoderLayer(d_model=C, d_ffn=1024, n_levels=L, n_heads=M, n_points=P, dtype=dt)
    params = layer.init(
        {"params": jax.random.PRNGKey(0)}, src, pos, ref, SHAPES, mask, False
    )

    chained(
        lambda x: layer.apply(params, x, pos, ref, SHAPES, mask, False),
        src,
        "EncoderLayer standard",
    )

    srcT = jnp.swapaxes(src, 1, 2)
    posT = jnp.swapaxes(pos, 1, 2)
    refT = jnp.transpose(ref, (0, 2, 3, 1))
    chained(
        lambda x: layer.apply(params, x, posT, refT, SHAPES, mask, False, channel_major=True),
        srcT,
        "EncoderLayer channel-major",
    )

    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P, dtype=dt)
    mparams = mod.init(jax.random.PRNGKey(0), src, ref, src, SHAPES, mask)
    chained(
        lambda x: mod.apply(mparams, x, ref, x, SHAPES, mask),
        src,
        "MSDAModule standard",
    )
    chained(
        lambda x: mod.apply(mparams, x, refT, x, SHAPES, mask, channel_major=True),
        srcT,
        "MSDAModule channel-major",
    )


if __name__ == "__main__":
    main()
