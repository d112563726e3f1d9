#!/usr/bin/env python
"""v7 MSDA kernel: on-device parity vs the jnp oracle + chained timing."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(__file__))
from profile_pallas import make_locs, SHAPES, M, D, P, L, T

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.attic.ms_deform_attn_pallas_v7 import ms_deform_attn_pallas_v7


def main():
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in SHAPES)
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    attn = jnp.asarray(rng.rand(T, S, M, L, P) / (L * P), jnp.bfloat16)
    loc_local = make_locs(rng, S, "local")
    loc_uniform = make_locs(rng, S, "uniform")

    # correctness first (f32, 1 frame)
    for name, loc in (("local", loc_local), ("uniform", loc_uniform)):
        val32 = val.astype(jnp.float32)[:1]
        a32 = attn.astype(jnp.float32)[:1]
        ref = ms_deform_attn_core_jnp(val32, SHAPES, loc[:1], a32)
        out = ms_deform_attn_pallas_v7(val32, SHAPES, loc[:1], a32)
        err = float(jnp.max(jnp.abs(ref - out)))
        print(f"max abs err vs jnp core (f32, {name}): {err:.2e}", flush=True)
        assert err < 5e-3, err  # matches v6 envelope (TPU f32 dot = bf16 passes)

    def chained(fn, loc, reps, name):
        @jax.jit
        def run(v):
            def body(carry, _):
                out = fn(carry, SHAPES, loc, attn)
                fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
                return carry + fb, jnp.sum(out).astype(jnp.float32)
            final, s = jax.lax.scan(body, v, None, length=reps)
            return jnp.sum(s)
        t0 = time.time(); float(run(val)); ct = time.time() - t0
        t0 = time.time(); float(run(val)); rt = time.time() - t0
        print(f"{name:38s} {rt / reps * 1000:9.1f} ms/iter (compile {ct:.0f}s)",
              flush=True)

    hb = os.environ.get("VNEXT_MSDA_HB", "16")
    tq = os.environ.get("VNEXT_MSDA_TQ", "256")
    pipe = os.environ.get("VNEXT_MSDA_PIPELINE", "1")
    tag = f"hb={hb} tq={tq} pipe={pipe}"
    chained(ms_deform_attn_pallas_v7, loc_local, 8, f"v7 local {tag}")
    chained(ms_deform_attn_pallas_v7, loc_uniform, 8, f"v7 uniform {tag}")


if __name__ == "__main__":
    main()
