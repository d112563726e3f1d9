#!/usr/bin/env python
"""Bare-kernel GSZ x HB sweep at eval shapes, under two offset regimes.

The executed-flops of the grouped path scale with the per-point-group row
span: gsz=4 folds all P points into one span (inter-point spread inflates
it), gsz=1 gives each point its own (rmin, nch) window at 4x the schedule
slots. Which wins depends on the offset structure, so both regimes run:

  init   — offsets constant per (head, level, point) (the reference's
           zero-weight + grid-bias init: spans = query extent + 1)
  random — query-dependent N(0, 2 px) offsets (trained-net stand-in)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm_fused

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
    per = min(ts) / N * 1000
    print(f"{name:44s} {per:8.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return per


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    valT = jnp.asarray(rng.randn(T, C, S), dt)
    logits = jnp.asarray(rng.randn(T, M, L, P, S), dt)
    ref = np.concatenate(
        [
            np.stack(
                np.meshgrid((np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h),
                0,
            ).reshape(2, h * w)
            for h, w in SHAPES
        ],
        1,
    )
    refT = jnp.asarray(np.tile(ref[None, None], (T, L, 1, 1)), jnp.float32)

    # init regime: the reference bias pattern (head-direction circle, point i
    # scaled by i+1), broadcast over queries
    thetas = np.arange(M, dtype=np.float32) * (2.0 * np.pi / M)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)       # [M, 2]
    bias = np.tile(grid[:, None, None, :], (1, L, P, 1))
    for i in range(P):
        bias[:, :, i, :] *= i + 1                            # [M, L, P, 2]
    off_init = jnp.asarray(
        np.tile(bias.transpose(0, 1, 2, 3)[None, :, :, :, :, None], (T, 1, 1, 1, 1, S)),
        dt,
    )
    off_rand = jnp.asarray(rng.randn(T, M, L, P, 2, S) * 2.0, dt)

    for regime, off in (("init", off_init), ("random", off_rand)):
        def entry(x, off=off):
            return ms_deform_attn_pallas_v9_cm_fused(
                x, SHAPES, off, refT, logits, attn_is_logits=True
            )

        for gsz, hb, tq, tpp in (
            ("4", "8", "256", "2"),     # production default
            ("1", "8", "256", "2"),
            ("1", "4", "256", "2"),
            ("2", "4", "256", "2"),
            ("2", "8", "256", "2"),
            ("4", "4", "256", "2"),
            ("1", "4", "512", "1"),
        ):
            os.environ["VNEXT_MSDA_V9_GSZ"] = gsz
            os.environ["VNEXT_MSDA_V9_HB"] = hb
            os.environ["VNEXT_MSDA_V9_TQ"] = tq
            os.environ["VNEXT_MSDA_V9_TPP"] = tpp
            chained(entry, valT, f"{regime}: gsz={gsz} hb={hb} tq={tq} tpp={tpp}")
    for k in ("VNEXT_MSDA_V9_GSZ", "VNEXT_MSDA_V9_HB", "VNEXT_MSDA_V9_TQ",
              "VNEXT_MSDA_V9_TPP"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
