#!/usr/bin/env python
"""On-device A/B: fused encoder epilogue kernel vs the XLA module chain.

Eval shapes: [10, 256, 8617] channel-major tokens, d_ffn 1024.
Run: python tools/exp_epilogue.py
"""
import sys, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.ops.encoder_epilogue import encoder_epilogue_cm

B, C, S, F = 10, 256, 8617, 1024
DT = jnp.bfloat16

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randn(B, C, S) * 0.1, DT)
src = jnp.asarray(rng.randn(B, C, S), DT)
g1 = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
be1 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
w1 = jnp.asarray(rng.randn(C, F) * 0.05, jnp.float32)
b1 = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
w2 = jnp.asarray(rng.randn(F, C) * 0.05, jnp.float32)
b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
g2 = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
be2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)


def xla_chain(a, src):
    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(1, keepdims=True)
        var = (xf * xf).mean(1, keepdims=True) - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * g[:, None] + b[:, None]).astype(DT)

    h = ln(src + a, g1, be1)
    ff = jnp.einsum("io,bis->bos", w1.astype(DT), h) + b1.astype(DT)[:, None]
    ff = jnp.maximum(ff, 0)
    y = jnp.einsum("io,bis->bos", w2.astype(DT), ff) + b2.astype(DT)[:, None]
    return ln(h + y, g2, be2)


def fused(a, src):
    return encoder_epilogue_cm(a, src, g1, be1, w1, b1, w2, b2, g2, be2)


def timeit(name, fn, n=48):
    @jax.jit
    def run(aa, ss):
        def body(carry, _):
            out = fn(carry, ss)
            fb = (out[:, :1, :1] * 1e-12).astype(carry.dtype)
            return carry + jnp.pad(fb, ((0, 0), (0, carry.shape[1] - 1), (0, carry.shape[2] - 1))), out[0, 0, 0].astype(jnp.float32)
        final, sums = jax.lax.scan(body, aa, None, length=n)
        return jnp.sum(sums)

    @jax.jit
    def nullg(aa):
        return jnp.sum(aa[0, :8, 0]).astype(jnp.float32)

    float(nullg(a))
    t0 = time.time()
    for _ in range(4):
        float(nullg(a))
    sync_s = (time.time() - t0) / 4
    t0 = time.time(); float(run(a, src)); ct = time.time() - t0
    t0 = time.time(); float(run(a, src)); rt = max(time.time() - t0 - sync_s, 0.0)
    print(f"{name}: {rt / n * 1000:.3f} ms/iter (compile {ct:.1f}s)", flush=True)


out_a = np.asarray(xla_chain(a, src), np.float32)
out_b = np.asarray(fused(a, src), np.float32)
print("maxdiff:", np.abs(out_a - out_b).max(), "mag:", np.abs(out_a).max(), flush=True)

timeit("xla_chain", xla_chain)
timeit("fused_epilogue", fused)
