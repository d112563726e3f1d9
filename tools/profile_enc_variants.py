#!/usr/bin/env python
"""In-model encoder-stage timing under env-knob variants (round-5).

Same chained-scan stage harness as profile_components.py, but only the
encoder stage, re-traced per variant:
  default     — fused softmax + in-kernel sched + fused epilogue (r5 default)
  empty       — VNEXT_MSDA_V9_ABLATE=empty: kernel compute ablated -> glue+floor
  ksched0     — host (scalar-prefetch) schedules instead of in-kernel
  fused0      — VNEXT_MSDA_FUSED=0: XLA softmax + materialized locations
  epi0        — VNEXT_FUSED_EPILOGUE=0: unfused FFN/LN tail
  carry1      — VNEXT_MSDA_V9_CARRY=1: SSA-carried accumulator
Differences vs `default` give each knob's in-model worth; `empty` gives the
kernel-compute share. The fixed scalar-pull RPC floor (~30ms/N) cancels in
differences only — absolute numbers include it.
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

from vnext_tpu.models.idol import build_idol_model
from vnext_tpu.config import get_cfg, add_idol_config

T, H, W = 10, 480, 864
REPS = int(os.environ.get("REPS", "8"))


def time_encoder(model, params, frames, sizes, name):
    @jax.jit
    def run(x):
        def body(carry, _):
            srcs, valid_hw, poses = model.bind({"params": params}).extract_features(carry, sizes)
            memory, *_ = model.bind({"params": params}).transformer.encode(srcs, valid_hw, poses)
            fb = (jnp.sum(memory.astype(jnp.float32)) * 1e-9).astype(carry.dtype)
            return carry + fb, jnp.sum(memory).astype(jnp.float32)

        final, ss = jax.lax.scan(body, x, None, length=REPS)
        return jnp.sum(ss)

    t0 = time.time()
    float(run(frames))
    ct = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        float(run(frames))
        ts.append(time.time() - t0)
    ms = min(ts) / REPS * 1000
    print(f"{name:12s} {ms:8.1f} ms  (compile {ct:.0f}s)", flush=True)
    return ms


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    model = build_idol_model(cfg)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]] * T, jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
        method=type(model).inference,
    )["params"]

    variants = [
        ("default", {}),
        ("empty", {"VNEXT_MSDA_V9_ABLATE": "empty"}),
        ("ksched0", {"VNEXT_MSDA_KSCHED": "0"}),
        ("fused0", {"VNEXT_MSDA_FUSED": "0"}),
        ("epi0", {"VNEXT_FUSED_EPILOGUE": "0"}),
        ("carry1", {"VNEXT_MSDA_V9_CARRY": "1"}),
    ]
    # fine-grained in-kernel ablations (VARIANTS=ablate): difference each vs
    # default to split kernel compute into matmul / y-interp / x-tent /
    # dynamic-loop / slice / per-path shares, all IN-MODEL
    if os.environ.get("VARIANTS") == "ablate":
        variants = [
            ("default", {}),
            ("empty", {"VNEXT_MSDA_V9_ABLATE": "empty"}),
            ("nogrouped", {"VNEXT_MSDA_V9_ABLATE": "nogrouped"}),
            ("nopacked", {"VNEXT_MSDA_V9_ABLATE": "nopacked"}),
            ("noloop", {"VNEXT_MSDA_V9_ABLATE": "noloop"}),
            ("r0c", {"VNEXT_MSDA_V9_ABLATE": "r0c"}),
            ("nomm", {"VNEXT_MSDA_V9_ABLATE": "nomm"}),
            ("noyint", {"VNEXT_MSDA_V9_ABLATE": "noyint"}),
            ("noxsel", {"VNEXT_MSDA_V9_ABLATE": "noxsel"}),
        ]
    base_env = {k: os.environ.get(k) for _, e in variants for k in e}
    res = {}
    for name, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        try:
            res[name] = time_encoder(model, params, frames, sizes, name)
        finally:
            for k in env:
                if base_env[k] is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = base_env[k]
    import json

    print(json.dumps({k: round(v, 1) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
