#!/usr/bin/env python
"""In-kernel stage ablation of the v9 cm_fused forward at IDOL eval shapes.

Splits the per-layer kernel time into: packed vs grouped paths, and within
the grouped path the x-selector build / u matmul / y-interp stages
(VNEXT_MSDA_V9_ABLATE=noxsel|nomm|noyint substitute near-free stand-ins).
Subtract the chained-harness floor (null entry) from everything.
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
OFF_SCALE = float(os.environ.get("OFF_SCALE", "2.0"))


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
    print(f"{name:40s} {per:8.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return per


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    valT = jnp.asarray(rng.randn(T, C, S), dt)
    off = jnp.asarray(rng.randn(T, M, L, P, 2, S) * OFF_SCALE, dt)
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
    )  # [2, S]
    refT = jnp.asarray(np.tile(ref[None, None], (T, L, 1, 1)), jnp.float32)

    chained(lambda x: x * 1.001, valT, "null (harness floor)")
    for ab in ("", "noxsel", "nomm", "noyint", "noloop", "r0c", "acc1",
               "nogrouped", "nopacked", "empty"):
        os.environ["VNEXT_MSDA_V9_ABLATE"] = ab
        chained(
            lambda x: ms_deform_attn_pallas_v9_cm_fused(
                x, SHAPES, off, refT, logits, attn_is_logits=True
            ),
            valT,
            f"v9 cm_fused ablate={ab or 'none'}",
        )
    os.environ["VNEXT_MSDA_V9_ABLATE"] = ""


if __name__ == "__main__":
    main()
