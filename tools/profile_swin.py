#!/usr/bin/env python
"""Swin-L backbone ablation profile at IDOL eval shapes (chained-scan, axon-safe).

VERDICT r4 item 5: IDOL-Swin-L runs 35 fps/chip with no dedicated perf work.
This localizes backbone time two ways:
  - branch ablations (VNEXT_SWIN_VARIANT knobs in models/backbones/swin.py):
    noattn / nomlp / sm_bf16 / noshift / nobias — full - ablated = branch cost;
  - stage-depth ablations (zeroing DEPTHS entries): stage-k block cost.
All rows share the fixed axon scalar-pull RPC cost; differences cancel it.
"""
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vnext_tpu.config import get_cfg, add_idol_config
from vnext_tpu.models.backbones.swin import build_swin_backbone

T, H, W = 10, 480, 864
REPS = int(os.environ.get("REPS", "8"))


def time_variant(label, depths=None, variant=""):
    os.environ["VNEXT_SWIN_VARIANT"] = variant
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.merge_from_file("configs/idol/ytvis19_swinL.yaml")
    cfg.MODEL.WEIGHTS = ""
    if depths is not None:
        cfg.MODEL.SWIN.DEPTHS = list(depths)
    model = build_swin_backbone(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), frames[:1]))()
    jax.block_until_ready(params)

    # Direct async dispatches closed by one scalar pull, minus the measured
    # null-sync baseline (bench.py's validated pattern).  The earlier
    # scan-of-REPS wrapper compiled pathologically slowly (>570 s vs the 22 s
    # bench.py sees for the direct graph), so rows use the bench shape.
    @jax.jit
    def run(x):
        feats = model.apply(params, x)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values())

    def pull(out):
        return float(jnp.reshape(out, (-1,))[0])

    t0 = time.time(); out = run(frames); pull(out); compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        pull(out)
    sync_s = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(REPS):
        out = run(frames)
    pull(out)
    ms = max((time.time() - t0 - sync_s), 1e-9) / REPS * 1000
    print(f"{label:26s} {ms:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    os.environ["VNEXT_SWIN_VARIANT"] = ""
    return ms


def main():
    rows = [
        ("full", None, ""),
        ("noattn", None, "noattn"),
        ("nomlp", None, "nomlp"),
        ("sm_bf16", None, "sm_bf16"),
        ("noshift", None, "noshift"),
        ("nobias", None, "nobias"),
        ("depths[2,2,0,2]", (2, 2, 0, 2), ""),
        ("depths[2,2,18,0]", (2, 2, 18, 0), ""),
        ("depths[0,0,18,2]", (0, 0, 18, 2), ""),
    ]
    only = os.environ.get("ONLY")
    res = {}
    for label, depths, variant in rows:
        if only and only not in label:
            continue
        res[label] = time_variant(label, depths, variant)
    if "full" in res:
        for k, v in res.items():
            if k != "full":
                print(f"  full - {k:22s} = {res['full'] - v:7.1f} ms")


if __name__ == "__main__":
    main()
