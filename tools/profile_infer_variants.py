#!/usr/bin/env python
"""Whole-model IDOL inference timing under env-knob variants (round-5).

Chained-scan over the FULL inference() (the bench's own jitted function), so
variant differences translate 1:1 to headline fps. Each variant re-traces.

Variants cover the open perf levers:
  default       — current tree defaults
  dec_cm0       — VNEXT_DEC_CM=0: standard-layout decoder cross-attn (old)
  tpp4          — VNEXT_MSDA_V9_TPP=4: half the kernel grid (floor check)
  tq512         — TQ=512 TPP=1: same tile volume, wider tiles
  hb16          — taller row chunks (fewer dynamic-loop iterations)

Run serialized with nothing else on the 1-core host.
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

from vnext_tpu.config import add_idol_config, get_cfg
from vnext_tpu.models.idol import build_idol_model

T, H, W = 10, 480, 864
REPS = int(os.environ.get("REPS", "8"))


def time_infer(model, params, frames, sizes, name):
    @jax.jit
    def run(x):
        def body(carry, _):
            out = model.bind({"params": params}).inference(carry, sizes)
            o = out["pred_logits"]
            fb = (jnp.sum(o.astype(jnp.float32)) * 1e-9).astype(carry.dtype)
            return carry + fb, jnp.sum(o).astype(jnp.float32)

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
    print(f"{name:14s} {ms:8.1f} ms/clip  (compile {ct:.0f}s)", flush=True)
    return ms


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
        method=type(model).inference,
    )["params"]

    only = os.environ.get("VARIANTS", "")
    variants = [
        ("default", {}),
        ("dec_cm0", {"VNEXT_DEC_CM": "0"}),
        ("tpp4", {"VNEXT_MSDA_V9_TPP": "4"}),
        ("tq512", {"VNEXT_MSDA_V9_TQ": "512", "VNEXT_MSDA_V9_TPP": "1"}),
        ("hb16", {"VNEXT_MSDA_V9_HB": "16"}),
    ]
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    base = {}
    for name, env in variants:
        for k, v in env.items():
            base[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            time_infer(model, params, frames, sizes, name)
        finally:
            for k in env:
                if base[k] is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = base[k]


if __name__ == "__main__":
    main()
