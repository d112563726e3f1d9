#!/usr/bin/env python
"""Sweep v9 MSDA kernel knobs on REAL model sampling distributions (TPU).

Usage: python tools/sweep_msda_v9.py "TQ=256,HB=8,ABLATE=empty" ...
Each config runs in a fresh subprocess (env is read at trace time).
Knobs: TQ GSZ HB PACK TPP HPB PREP2 ABLATE; DEC=1 switches to decoder
shapes (Q=300) with the real decoder sampling distribution.
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
from vnext_tpu.ops.ms_deform_attn_pallas_v9 import (
    ms_deform_attn_pallas_v9, ms_deform_attn_pallas_v9_cm)
T = int(os.environ.get("VNEXT_SWEEP_T", str(T)))
cm = os.environ.get("VNEXT_SWEEP_ENTRY", "std") == "cm"
rng = np.random.RandomState(0)
S = sum(h * w for h, w in SHAPES)
z = np.load("/tmp/msda_real_locs.npz")
dec = os.environ.get("VNEXT_SWEEP_DEC", "0") == "1"
key = "dec" if dec else "enc"
loc = np.tile(z[key + "_loc"][:1], (T, 1, 1, 1, 1, 1))
attn = np.tile(z[key + "_attn"][:1], (T, 1, 1, 1, 1))
if cm:
    # CM layouts: value [B, M*D, S]; loc [B,M,L,P,2,Q]; attn [B,M,L,P,Q]
    val = jnp.asarray(rng.randn(T, M * D, S), jnp.bfloat16)
    loc = jnp.asarray(np.transpose(loc, (0, 2, 3, 4, 5, 1)), jnp.float32)
    attn = jnp.asarray(np.transpose(attn, (0, 2, 3, 4, 1)), jnp.bfloat16)
    fn = lambda v: ms_deform_attn_pallas_v9_cm(v, SHAPES, loc, attn)
else:
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(attn, jnp.bfloat16)
    fn = lambda v: ms_deform_attn_pallas_v9(v, SHAPES, loc, attn)
N = int(os.environ.get("VNEXT_SWEEP_N", "32"))
@jax.jit
def run(v):
    def body(carry, _):
        out = fn(carry)
        fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
        return carry + fb, jnp.sum(out).astype(jnp.float32)
    final, s = jax.lax.scan(body, v, None, length=N)
    return jnp.sum(s)
# the axon tunnel charges ~30 ms per host sync (float()) regardless of device
# work — measure it with a trivial graph and subtract, then amortize over N
@jax.jit
def nullg(v):
    return jnp.sum(v[0, :8]).astype(jnp.float32)
float(nullg(val)); t0 = time.time()
for _ in range(4):
    float(nullg(val))
sync_s = (time.time() - t0) / 4
t0 = time.time(); float(run(val)); ct = time.time() - t0
t0 = time.time(); float(run(val)); rt = max(time.time() - t0 - sync_s, 0.0)
cfg = {k: os.environ.get("VNEXT_MSDA_V9_" + k, "-")
       for k in ("TQ", "GSZ", "HB", "PACK", "TPP", "HPB", "PREP2", "ABLATE",
                 "NOPACK_L", "ZPREP")}
cfg["DEC"] = os.environ.get("VNEXT_SWEEP_DEC", "0")
cfg["ENTRY"] = os.environ.get("VNEXT_SWEEP_ENTRY", "std")
cfg["T"] = T
print(f"RESULT {cfg} {rt / N * 1000:.2f} ms/iter (sync {sync_s * 1000:.0f}ms, "
      f"compile {ct:.0f}s)", flush=True)
"""

for spec in sys.argv[1:]:
    env = dict(os.environ)
    for kv in spec.split(","):
        k, v = kv.split("=")
        if k == "DEC":
            env["VNEXT_SWEEP_DEC"] = v
        elif k == "T":
            env["VNEXT_SWEEP_T"] = v
        elif k == "ENTRY":
            env["VNEXT_SWEEP_ENTRY"] = v
        else:
            env[f"VNEXT_MSDA_V9_{k}"] = v
    r = subprocess.run([sys.executable, "-c", SNIPPET], env=env,
                       capture_output=True, text=True)
    out = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    print(out[0] if out else f"FAILED {spec}\n{r.stderr[-2000:]}", flush=True)
