#!/usr/bin/env python
"""Microbenchmark gather strategies for MSDeformAttn on the real TPU.

The op's core is ~4.3M random 32-float row reads per frame-layer (encoder).
This script times candidate formulations to pick the kernel strategy:
  1. take_along_axis on [B*M, S, D]   (current impl)
  2. flat jnp.take on [BM*S, D]
  3. one-hot matmul (decoder-scale only)
  4. row-padded gather ([S, 128] rows)
  5. full ms_deform_attn_core_jnp encoder-shape call
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:42s} {dt * 1000:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    # encoder scale: B=10 frames, M=8 heads, S=8500 tokens, D=32, Q=8500, K=64 samples (L*P*4)
    B, M, S, D, Q, SAMP = 10, 8, 8500, 32, 8500, 64
    value = jnp.asarray(rng.randn(B * M, S, D), jnp.float32)
    idx = jnp.asarray(rng.randint(0, S, (B * M, Q * SAMP)), jnp.int32)

    f1 = jax.jit(lambda v, i: jnp.take_along_axis(v, i[..., None], axis=1))
    timeit(f1, value, idx, iters=3, name="take_along_axis [BM,S,D] idx[BM,Q*64]")

    value_flat = value.reshape(B * M * S, D)
    offs = (jnp.arange(B * M) * S)[:, None]
    idx_flat = (idx + offs).reshape(-1)
    f2 = jax.jit(lambda v, i: jnp.take(v, i, axis=0))
    timeit(f2, value_flat, idx_flat, iters=3, name="flat take [BMS,D]")

    # smaller sample count (decoder scale: Q=300)
    idx_dec = jnp.asarray(rng.randint(0, S, (B * M, 300 * SAMP)), jnp.int32)
    timeit(f1, value, idx_dec, iters=10, name="take_along_axis decoder-scale")

    # row-padded to 128 lanes
    value_pad = jnp.pad(value, ((0, 0), (0, 0), (0, 128 - D)))
    timeit(f1, value_pad, idx, iters=3, name="take_along_axis D=128 rows")

    # gather via one-hot matmul at decoder scale
    def onehot_mm(v, i):
        oh = jax.nn.one_hot(i, S, dtype=jnp.bfloat16)  # [BM, Q*, S]
        return jnp.einsum("bqs,bsd->bqd", oh, v.astype(jnp.bfloat16))

    f3 = jax.jit(onehot_mm)
    timeit(f3, value, idx_dec, iters=3, name="one-hot matmul decoder-scale")

    # full jnp msda at encoder shape, single frame
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp

    shapes = ((60, 108), (30, 54), (15, 27), (8, 14))
    S2 = sum(h * w for h, w in shapes)
    val2 = jnp.asarray(rng.randn(1, S2, M, D), jnp.float32)
    loc = jnp.asarray(rng.rand(1, S2, M, 4, 4, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(1, S2, M, 4, 4), jnp.float32)
    f4 = jax.jit(lambda v, l, a: ms_deform_attn_core_jnp(v, shapes, l, a))
    timeit(f4, val2, loc, attn, iters=3, name="ms_deform_attn_core_jnp 1frame enc")

    # bf16 variant
    f5 = jax.jit(
        lambda v, l, a: ms_deform_attn_core_jnp(v.astype(jnp.bfloat16), shapes, l, a.astype(jnp.bfloat16))
    )
    timeit(f5, val2, loc, attn, iters=3, name="ms_deform_attn_core_jnp bf16")


if __name__ == "__main__":
    main()
