#!/usr/bin/env python
"""Finer chained timing: factorized MSDA enc-scale, encoder stack, mask head."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

T = 10
REPS = 4

def chained_time(make_fn, init_x, name, n=REPS):
    @jax.jit
    def run(x):
        def body(carry, _):
            nx, s = make_fn(carry)
            return nx, s
        final, ss = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(ss)
    t0 = time.time(); float(run(init_x)); compile_t = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time(); float(run(init_x)); ts.append(time.time() - t0)
    per = min(ts) / n * 1000
    print(f"{name:44s} {per:9.1f} ms/iter   (compile {compile_t:.0f}s)", flush=True)
    return per

def main():
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_factorized_xla
    rng = np.random.RandomState(0)
    shapes = ((60, 108), (30, 54), (15, 27), (8, 14))
    S = sum(h * w for h, w in shapes)
    M, D, P, L = 8, 32, 4, 4

    # 1. factorized MSDA at encoder scale (one layer's op), 10 frames folded
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(T, S, M, L, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(T, S, M, L, P), jnp.bfloat16)
    def msda_fn(v):
        out = ms_deform_attn_factorized_xla(v, shapes, loc, attn)
        fb = (jnp.mean(out) * 1e-6).astype(v.dtype)
        return v + fb, jnp.sum(out.astype(jnp.float32))
    chained_time(msda_fn, val, "factorized msda enc-scale x10f (1 layer)")

    # 2. decoder-scale MSDA (Q=300)
    locd = jnp.asarray(rng.rand(T, 300, M, L, P, 2), jnp.float32)
    attnd = jnp.asarray(rng.rand(T, 300, M, L, P), jnp.bfloat16)
    def msda_dec(v):
        out = ms_deform_attn_factorized_xla(v, shapes, locd, attnd)
        fb = (jnp.mean(out) * 1e-6).astype(v.dtype)
        return v + fb, jnp.sum(out.astype(jnp.float32))
    chained_time(msda_dec, val, "factorized msda dec-scale x10f (1 layer)")

    # 3. dynamic mask head at inference scale
    from vnext_tpu.models.condinst import run_dynamic_mask_head
    Hm, Wm = 60, 108
    mask_feats = jnp.asarray(rng.randn(T, Hm, Wm, 8), jnp.float32)
    ref = jnp.asarray(rng.rand(T, 300, 2), jnp.float32) * jnp.asarray([864.0, 480.0])
    params_dyn = jnp.asarray(rng.randn(T, 300, 169), jnp.float32)
    def mh_fn(x):
        out = run_dynamic_mask_head(x, ref, params_dyn, rel_coord=True,
                                    mask_feat_stride=8, mask_out_stride=4)
        fb = (jnp.mean(out) * 1e-6).astype(x.dtype)
        return x + fb, jnp.sum(out.astype(jnp.float32))
    chained_time(mh_fn, mask_feats, "dynamic mask head x10f (300 q)")

if __name__ == "__main__":
    main()
