#!/usr/bin/env python
"""MinVIS (frame-level Mask2Former) inference throughput on one chip.

Third VIS family number alongside bench.py (IDOL) and bench_seqformer.py.
MinVIS runs the frame-level MaskFormer over a window of frames
(reference video_maskformer_model.py:445 run_window_inference); we time the
10-frame window at eval shapes.
"""

import json
import os
import sys
import time

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
    from vnext_tpu.models.mask2former import MaskFormer, build_maskformer_model
    from vnext_tpu.config import get_cfg, add_maskformer_config

    cfg = get_cfg()
    add_maskformer_config(cfg)
    model = build_maskformer_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (CLIP_LEN, H, W, 3)), jnp.uint8)
    sizes = jnp.asarray([[H, W - 11]] * CLIP_LEN, jnp.int32)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])

    def infer(params, imgs, szs):
        x = (imgs.astype(jnp.float32) - mean) / std
        return model.apply({"params": params}, x, szs, method=MaskFormer.inference)

    t0 = time.time()
    init_imgs = (frames[:1].astype(jnp.float32) - mean) / std
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, init_imgs, sizes[:1],
                           method=MaskFormer.inference)
    )()["params"]
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
        "metric": "MinVIS/Mask2Former-R50 frame inference throughput (480x864, window=10)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "detail": {"backend": jax.default_backend(),
                   "init_s": round(init_s, 1),
                   "compile_s": round(compile_s, 1),
                   "per_window_ms": round(1000 * elapsed / n_iters, 1)},
    }))


if __name__ == "__main__":
    main()
