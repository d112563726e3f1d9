#!/usr/bin/env python
"""Chained timing of the Pallas MSDA kernel at encoder scale.

Two location regimes:
- local:   encoder-realistic — each query is a map pixel, sampling points are
           its own normalized position +- a few pixels (matches the reference
           ring-bias offset init and trained-model locality)
- uniform: adversarial — uniform random over the whole map (every tile touches
           every row block; the blocked kernel degenerates to unblocked speed)
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

SHAPES = ((60, 108), (30, 54), (15, 27), (8, 14))
M, D, P, L = 8, 32, 4, 4
T = 10


def make_locs(rng, S, regime, offset_px=4.0):
    if regime == "uniform":
        return jnp.asarray(rng.rand(T, S, M, L, P, 2), jnp.float32)
    # reference points: each query's own normalized center at its level
    refs = []
    for h, w in SHAPES:
        yy, xx = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        refs.append(np.stack([xx, yy], -1).reshape(h * w, 2))
    ref = np.concatenate(refs, 0)  # [S, 2]
    wh = np.array([[w, h] for h, w in SHAPES], np.float32)  # [L, 2]
    off = (rng.rand(T, S, M, L, P, 2) * 2 - 1) * offset_px  # pixels at each level
    loc = ref[None, :, None, None, None, :] + off / wh[None, None, None, :, None, :]
    return jnp.asarray(loc, jnp.float32)


def main():
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
    from vnext_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas

    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in SHAPES)
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    attn = jnp.asarray(rng.rand(T, S, M, L, P) / (L * P), jnp.bfloat16)

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
        print(f"{name:34s} {rt / reps * 1000:9.1f} ms/iter (compile {ct:.0f}s)", flush=True)

    loc_local = make_locs(rng, S, "local")
    loc_uniform = make_locs(rng, S, "uniform")
    chained(ms_deform_attn_pallas, loc_local, 8, "pallas local-offsets x10f")
    chained(ms_deform_attn_pallas, loc_uniform, 8, "pallas uniform(adversarial) x10f")

    # correctness spot-check on-device (f32)
    for name, loc in (("local", loc_local), ("uniform", loc_uniform)):
        val32 = val.astype(jnp.float32)[:1]
        a32 = attn.astype(jnp.float32)[:1]
        ref = ms_deform_attn_core_jnp(val32, SHAPES, loc[:1], a32)
        out = ms_deform_attn_pallas(val32, SHAPES, loc[:1], a32)
        err = float(jnp.max(jnp.abs(ref - out)))
        print(f"max abs err vs jnp core (f32, {name}):", err, flush=True)


if __name__ == "__main__":
    main()
