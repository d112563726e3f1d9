#!/usr/bin/env python
"""Measure IDOL-R50 inference fps/chip vs frames-per-dispatch (clip batching).

IDOL.inference treats the clip/frame axis as a pure batch (idol.py:289), so
running 2+ clips per jit dispatch is numerically identical per frame; this
measures how throughput scales as the per-dispatch floor amortizes.
"""
import os
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vnext_tpu.models import IDOL
from vnext_tpu.models.idol import build_idol_model
from vnext_tpu.config import get_cfg, add_idol_config

H, W = 480, 864
cfg = get_cfg()
add_idol_config(cfg)
cfg.MODEL.IDOL.NUM_CLASSES = 40
model = build_idol_model(cfg)

rng = np.random.RandomState(0)
mean = jnp.asarray([123.675, 116.28, 103.53])
std = jnp.asarray([58.395, 57.12, 57.375])


def infer(params, imgs, szs):
    x = (imgs.astype(jnp.float32) - mean) / std
    return model.apply({"params": params}, x, szs, method=IDOL.inference)


frames1 = jnp.asarray(rng.randint(0, 255, (1, H, W, 3)), jnp.uint8)
sizes1 = jnp.asarray([[H, W - 11]], jnp.int32)
init_imgs = (frames1.astype(jnp.float32) - mean) / std
params = jax.jit(
    lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, init_imgs, sizes1, method=IDOL.inference
    )
)()["params"]
jax.block_until_ready(params)
print("init done", flush=True)

infer_jit = jax.jit(infer)
for T in [int(x) for x in os.environ.get("BATCH_T", "10,20,40").split(",")]:
    frames = jnp.asarray(rng.randint(0, 255, (T, H, W, 3)), jnp.uint8)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)
    t0 = time.time()
    out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    ct = time.time() - t0
    iters = max(4, 80 // T)
    t0 = time.time()
    for _ in range(iters):
        out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(
        f"T={T:3d}  {T / dt:7.1f} fps/chip  {dt * 1000:7.1f} ms/dispatch"
        f"  (compile {ct:.0f}s)",
        flush=True,
    )
