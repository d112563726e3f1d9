#!/usr/bin/env python
"""SeqFormer-R50 whole-clip inference throughput on one chip.

Companion to bench.py (the driver's headline is IDOL); this records the
second VIS family's number. SeqFormer runs whole-video level inference
(reference seqformer.py:229-235 sets num_frames=video_length); we measure the
10-frame clip at eval shapes like the IDOL bench.
"""

import json
import os
import time

import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

CLIP_LEN = 10
H, W = 480, 864


def main():
    from vnext_tpu.models.seqformer import SeqFormer, build_seqformer_model
    from vnext_tpu.config import get_cfg, add_seqformer_config

    cfg = get_cfg()
    add_seqformer_config(cfg)
    cfg.MODEL.SeqFormer.NUM_CLASSES = 40
    model = build_seqformer_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (1, CLIP_LEN, H, W, 3)), jnp.uint8)
    sizes = jnp.asarray([[H, W - 11]], jnp.int32)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])

    def infer(params, imgs, szs):
        x = (imgs.astype(jnp.float32) - mean) / std
        return model.apply({"params": params}, x, szs, method=SeqFormer.inference)

    t0 = time.time()
    init_imgs = (frames.astype(jnp.float32) - mean) / std
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_imgs, sizes,
                           method=SeqFormer.inference)
    )()
    params = variables["params"]
    jax.block_until_ready(params)
    init_s = time.time() - t0

    infer_jit = jax.jit(infer)
    t0 = time.time()
    out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    n_iters = 8
    t0 = time.time()
    for _ in range(n_iters):
        out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    fps = CLIP_LEN * n_iters / elapsed
    print(json.dumps({
        "metric": "SeqFormer-R50 clip inference throughput (480x864, clip=10)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "detail": {"backend": jax.default_backend(),
                   "init_s": round(init_s, 1),
                   "compile_s": round(compile_s, 1),
                   "per_clip_ms": round(1000 * elapsed / n_iters, 1)},
    }))


if __name__ == "__main__":
    main()
