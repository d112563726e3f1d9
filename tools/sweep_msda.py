#!/usr/bin/env python
"""Sweep VNEXT_MSDA_HB / VNEXT_MSDA_TQ on the encoder-scale Pallas MSDA bench.

Each config runs in a subprocess (the env is read at trace time inside
_sample_level; a fresh process keeps jit caches honest). Local-offsets regime
only — that is the trained-model behavior the clip bench sees.
"""
import itertools
import os
import subprocess
import sys

import sys as _s
CONFIGS = [tuple(map(int, c.split('x'))) for c in _s.argv[1:]]

SNIPPET = r"""
import sys, os, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "tools")
from profile_pallas import make_locs, SHAPES, M, D, P, L, T
from vnext_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas
rng = np.random.RandomState(0)
S = sum(h * w for h, w in SHAPES)
val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
attn = jnp.asarray(rng.rand(T, S, M, L, P) / (L * P), jnp.bfloat16)
loc = make_locs(rng, S, "local")
@jax.jit
def run(v):
    def body(carry, _):
        out = ms_deform_attn_pallas(carry, SHAPES, loc, attn)
        fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
        return carry + fb, jnp.sum(out).astype(jnp.float32)
    final, s = jax.lax.scan(body, v, None, length=8)
    return jnp.sum(s)
t0 = time.time(); float(run(val)); ct = time.time() - t0
t0 = time.time(); float(run(val)); rt = time.time() - t0
print(f"RESULT hb={os.environ['VNEXT_MSDA_HB']} tq={os.environ['VNEXT_MSDA_TQ']} "
      f"{rt / 8 * 1000:.1f} ms/iter (compile {ct:.0f}s)", flush=True)
"""

for hb, tq in CONFIGS:
    env = dict(os.environ, VNEXT_MSDA_HB=str(hb), VNEXT_MSDA_TQ=str(tq))
    r = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                       capture_output=True, text=True, timeout=400)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            print(line, flush=True)
    if r.returncode != 0:
        print(f"FAIL hb={hb} tq={tq}: {r.stderr.strip().splitlines()[-1] if r.stderr else '?'}",
              flush=True)
