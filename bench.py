"""Benchmark: IDOL R50 per-clip inference throughput (frames/sec/chip).

Runs the flagship model (IDOL, ResNet-50, 6+6 deformable transformer, 300
queries, CondInst mask head over all queries) on realistic YTVIS eval shapes
(480x864 padded, clip length 10) and reports frames/sec on one chip.

Baseline context: the reference repo publishes no inference FPS for IDOL
(BASELINE.md), so ``vs_baseline`` is computed against the IDOL paper's commonly
cited ~30 FPS single-GPU figure as a stand-in reference point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

# persistent compilation cache: the driver re-runs this across rounds, and
# remote-TPU compiles are expensive
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

CLIP_LEN = 10
H, W = 480, 864
BASELINE_FPS = 30.0


def main():
    from vnext_tpu.models import IDOL
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.config import get_cfg, add_idol_config

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (CLIP_LEN, H, W, 3)), jnp.uint8)
    sizes = jnp.asarray([[H, W - 11]] * CLIP_LEN, jnp.int32)

    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])

    def infer(params, imgs, szs):
        x = (imgs.astype(jnp.float32) - mean) / std
        return model.apply({"params": params}, x, szs, method=IDOL.inference)

    t0 = time.time()
    init_imgs = (frames[:1].astype(jnp.float32) - mean) / std
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, init_imgs, sizes[:1], method=IDOL.inference
        )
    )()
    params = variables["params"]
    jax.block_until_ready(params)
    init_s = time.time() - t0

    infer_jit = jax.jit(infer)
    t0 = time.time()
    out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # timed runs
    n_iters = 8
    t0 = time.time()
    for _ in range(n_iters):
        out = infer_jit(params, frames, sizes)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    fps = CLIP_LEN * n_iters / elapsed

    # utilization: XLA compiled-graph FLOPs (pallas kernels contribute their
    # declared CostEstimate = executed selector-matmul flops incl. padding,
    # so this is MXU busy-fraction, not minimal-algorithm MFU) over v5e bf16
    # peak 197 TF/s/chip
    try:
        cost = jax.jit(infer).lower(params, frames, sizes).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    peak = 197e12
    mfu = flops / (elapsed / n_iters) / peak if flops else None

    print(
        json.dumps(
            {
                "metric": "IDOL-R50 clip inference throughput (480x864, clip=10)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "detail": {
                    "backend": jax.default_backend(),
                    "init_s": round(init_s, 1),
                    "compile_s": round(compile_s, 1),
                    "per_clip_ms": round(1000 * elapsed / n_iters, 1),
                    "compiled_gflops_per_clip": round(flops / 1e9, 1),
                    "mxu_utilization_est": round(mfu, 4) if mfu else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
