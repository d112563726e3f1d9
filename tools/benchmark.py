#!/usr/bin/env python
"""Train/eval throughput benchmark (reference surface: tools/benchmark.py:97,134
benchmark_train / benchmark_eval).

Measures the jitted SPMD train step and the per-clip inference step on synthetic
data with chained dependencies (so async dispatch cannot hide device time).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup_cache():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def benchmark_train(cfg, iters=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    _setup_cache()

    from vnext_tpu.engine.train_step import TrainState, make_train_step
    from vnext_tpu.models.criterion import Targets, default_weight_dict
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.solver import build_optimizer

    model = build_idol_model(cfg)
    h, w = cfg.TPU.TRAIN_IMAGE_SIZE
    k = cfg.TPU.MAX_INSTANCES
    b = max(1, cfg.SOLVER.IMS_PER_BATCH // 8)  # single-chip share of the 8-chip recipe
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    boxes = np.zeros((b, k, 4), np.float32)
    boxes[..., :2] = rng.rand(b, k, 2) * 0.5 + 0.25
    boxes[..., 2:] = 0.2
    targets = Targets(
        labels=jnp.zeros((b, k), jnp.int32),
        boxes=jnp.asarray(boxes),
        masks_s4=jnp.asarray(rng.rand(b, k, h // 4, w // 4) > 0.8),
        valid=jnp.asarray(np.tile(np.arange(k) < 5, (b, 1))),
        inst_id=jnp.zeros((b, k), jnp.int32),
    )
    # jitted init: eager per-op dispatch is pathological on remote-TPU backends
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images[:1], sizes[:1], images[:1], sizes[:1],
            jax.tree_util.tree_map(lambda x: x[:1], targets),
            jax.tree_util.tree_map(lambda x: x[:1], targets), train=False,
        )["params"]
    )()
    tx = build_optimizer(cfg, params)
    step = make_train_step(model, tx, default_weight_dict(dec_layers=cfg.MODEL.IDOL.DEC_LAYERS),
                           donate=False)
    state = TrainState.create(params, tx)
    batch = (images, sizes, images, sizes, targets, targets)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["total_loss"])  # force completion of compile+first step
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["total_loss"])
    dt = (time.time() - t0) / iters
    print(f"train: {dt * 1000:.1f} ms/iter  ({b / dt:.2f} clips/s = {2 * b / dt:.2f} frames/s)")


def benchmark_eval(cfg, iters=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vnext_tpu.models.idol import IDOL, build_idol_model

    _setup_cache()
    model = build_idol_model(cfg)
    h, w = cfg.TPU.TEST_IMAGE_SIZE
    t = cfg.MODEL.IDOL.BATCH_INFER_LEN
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(t, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]] * t, jnp.int32)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1], method=IDOL.inference
        )["params"]
    )()
    infer = jax.jit(lambda p, f, s: model.apply({"params": p}, f, s, method=IDOL.inference))
    out = infer(params, frames, sizes)
    float(jnp.sum(out["pred_logits"]))
    t0 = time.time()
    for _ in range(iters):
        out = infer(params, frames, sizes)
    float(jnp.sum(out["pred_logits"]))
    dt = (time.time() - t0) / iters
    print(f"eval: {dt * 1000:.1f} ms/clip  ({t / dt:.2f} frames/s)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--task", choices=["train", "eval", "both"], default="both")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from vnext_tpu.config import add_idol_config, get_cfg

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    if args.task in ("train", "both"):
        benchmark_train(cfg, args.iters)
    if args.task in ("eval", "both"):
        benchmark_eval(cfg, args.iters)


if __name__ == "__main__":
    main()
