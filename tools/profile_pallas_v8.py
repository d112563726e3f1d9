#!/usr/bin/env python
"""v8 MSDA kernel: on-device parity vs the jnp oracle + chained timing.

Uses REAL model sampling distributions when /tmp/msda_real_locs.npz exists
(dump via VNEXT_DUMP_LOCS=/tmp/msda_real_locs.npz tools/analyze_msda_spans.py);
falls back to the synthetic local/uniform generators otherwise. Compares v7 vs
v8 at encoder scale (10 frames, 480x864 eval shapes).
"""
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
from vnext_tpu.ops.attic.ms_deform_attn_pallas_v8 import ms_deform_attn_pallas_v8

NPZ = "/tmp/msda_real_locs.npz"


def main():
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in SHAPES)
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)

    cases = []
    if os.path.exists(NPZ):
        z = np.load(NPZ)
        assert [tuple(x) for x in z["shapes"]] == list(SHAPES), z["shapes"]
        for key in ("", "_last"):
            loc = np.tile(z[f"enc_loc{key}"][:1], (T, 1, 1, 1, 1, 1))
            attn = np.tile(z[f"enc_attn{key}"][:1], (T, 1, 1, 1, 1))
            cases.append((f"real{key or '_l0'}", jnp.asarray(loc, jnp.float32),
                          jnp.asarray(attn, jnp.bfloat16)))
    attn_syn = jnp.asarray(rng.rand(T, S, M, L, P) / (L * P), jnp.bfloat16)
    cases.append(("local", make_locs(rng, S, "local"), attn_syn))
    cases.append(("uniform", make_locs(rng, S, "uniform"), attn_syn))

    # correctness (f32, 1 frame)
    for name, loc, attn in cases:
        val32 = val.astype(jnp.float32)[:1]
        a32 = attn.astype(jnp.float32)[:1]
        ref = ms_deform_attn_core_jnp(val32, SHAPES, loc[:1], a32)
        out = ms_deform_attn_pallas_v8(val32, SHAPES, loc[:1], a32)
        err = float(jnp.max(jnp.abs(ref - out)))
        print(f"v8 max abs err vs jnp core (f32, {name}): {err:.2e}", flush=True)
        assert err < 5e-3, err

    def chained(fn, loc, attn, reps, name):
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
        print(f"{name:44s} {rt / reps * 1000:9.1f} ms/iter (compile {ct:.0f}s)",
              flush=True)

    reps = int(os.environ.get("REPS", "8"))
    for name, loc, attn in cases:
        chained(ms_deform_attn_pallas_v8, loc, attn, reps, f"v8 enc-scale x{T}f [{name}]")
        if os.environ.get("SKIP_V7", "0") != "1":
            chained(ms_deform_attn_pallas_v7, loc, attn, reps, f"v7 enc-scale x{T}f [{name}]")


if __name__ == "__main__":
    main()
