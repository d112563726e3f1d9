#!/usr/bin/env python
"""Chained timing of the Pallas MSDA kernel vs the jnp gather core at encoder scale."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

def main():
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
    from vnext_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    rng = np.random.RandomState(0)
    T = 10
    shapes = ((60, 108), (30, 54), (15, 27), (8, 14))
    S = sum(h * w for h, w in shapes)
    M, D, P, L = 8, 32, 4, 4
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(T, S, M, L, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(T, S, M, L, P) / (L * P), jnp.bfloat16)

    def chained(fn, reps, name):
        @jax.jit
        def run(v):
            def body(carry, _):
                out = fn(carry, shapes, loc, attn)
                fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
                return carry + fb, jnp.sum(out).astype(jnp.float32)
            final, s = jax.lax.scan(body, v, None, length=reps)
            return jnp.sum(s)
        t0 = time.time(); float(run(val)); ct = time.time() - t0
        t0 = time.time(); float(run(val)); rt = time.time() - t0
        print(f"{name:28s} {rt / reps * 1000:9.1f} ms/iter (compile {ct:.0f}s)", flush=True)

    chained(ms_deform_attn_pallas, 8, "pallas encoder-scale x10f")
    # correctness spot-check on-device (f32)
    val32 = val.astype(jnp.float32)[:1]
    a32 = attn.astype(jnp.float32)[:1]
    ref = ms_deform_attn_core_jnp(val32, shapes, loc[:1], a32)
    out = ms_deform_attn_pallas(val32, shapes, loc[:1], a32)
    err = float(jnp.max(jnp.abs(ref - out)))
    print("max abs err vs jnp core (f32):", err, flush=True)

if __name__ == "__main__":
    main()
