#!/usr/bin/env python
"""Sweep v8 MSDA kernel knobs on REAL model sampling distributions (TPU).

Usage: python tools/sweep_msda_v8.py "TQ=256,GSZ=2,HB=4,PACK=1" "TQ=512,..." ...
Each config runs in a fresh subprocess (env is read at trace time).
"""
import os
import subprocess
import sys

SNIPPET = r"""
import sys, os, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "tools")
from profile_pallas import SHAPES, M, D, P, L, T
from vnext_tpu.ops.attic.ms_deform_attn_pallas_v8 import ms_deform_attn_pallas_v8
rng = np.random.RandomState(0)
S = sum(h * w for h, w in SHAPES)
val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
z = np.load("/tmp/msda_real_locs.npz")
loc = jnp.asarray(np.tile(z["enc_loc"][:1], (T, 1, 1, 1, 1, 1)), jnp.float32)
attn = jnp.asarray(np.tile(z["enc_attn"][:1], (T, 1, 1, 1, 1)), jnp.bfloat16)
@jax.jit
def run(v):
    def body(carry, _):
        out = ms_deform_attn_pallas_v8(carry, SHAPES, loc, attn)
        fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
        return carry + fb, jnp.sum(out).astype(jnp.float32)
    final, s = jax.lax.scan(body, v, None, length=8)
    return jnp.sum(s)
t0 = time.time(); float(run(val)); ct = time.time() - t0
t0 = time.time(); float(run(val)); rt = time.time() - t0
cfg = {k: os.environ.get("VNEXT_MSDA_V8_" + k, "-") for k in ("TQ", "GSZ", "HB", "PACK", "ABLATE")}
cfg["PIPE"] = os.environ.get("VNEXT_MSDA_PIPELINE", "1")
print(f"RESULT {cfg} {rt / 8 * 1000:.1f} ms/iter (compile {ct:.0f}s)", flush=True)
"""

for spec in sys.argv[1:]:
    env = dict(os.environ)
    for kv in spec.split(","):
        k, v = kv.split("=")
        if k == "PIPE":
            env["VNEXT_MSDA_PIPELINE"] = v
        else:
            env[f"VNEXT_MSDA_V8_{k}"] = v
    r = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                       capture_output=True, text=True, timeout=900)
    printed = False
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            print(line, flush=True)
            printed = True
    if not printed:
        err = (r.stderr or "?").strip().splitlines()
        print(f"FAIL {spec}: {err[-1] if err else '?'}", flush=True)
