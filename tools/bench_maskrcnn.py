#!/usr/bin/env python
"""Mask R-CNN R50-FPN 1x train throughput on one chip (img/s).

Direct comparison against the reference's only published throughput number:
62 img/s on 8x V100 NVLink = 7.75 img/s per GPU (docs/notes/benchmarks.md:10-29,
detectron2 Mask R-CNN R50-FPN 1x, batch 16, ~800x1333 COCO shapes).

We time the full jitted train step (forward, RPN+ROI+mask losses, backward,
AdamW update) at the default detectron2 recipe shape: 2 images/chip at
832x1344 padded (the TPU fixed-shape analogue of shortest-edge-800 COCO).
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
import optax

import os as _os
B = int(_os.environ.get("VNEXT_MRCNN_BS", "2"))
H, W, K = 832, 1344, 24


def main():
    from vnext_tpu.models.rcnn import GeneralizedRCNN
    from vnext_tpu.models.retinanet import DetTargets

    model = GeneralizedRCNN(num_classes=80, mask_on=True, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[800, 1333]] * B, jnp.int32)
    boxes = np.zeros((B, K, 4), np.float32)
    for b in range(B):
        x0 = rng.randint(0, W - 128, K)
        y0 = rng.randint(0, H - 128, K)
        boxes[b] = np.stack([x0, y0, x0 + rng.randint(32, 128, K),
                             y0 + rng.randint(32, 128, K)], -1)
    targets = DetTargets(
        labels=jnp.asarray(rng.randint(0, 80, (B, K)), jnp.int32),
        boxes=jnp.asarray(boxes),
        valid=jnp.ones((B, K), bool),
    )
    gt_masks = np.zeros((B, K, H, W), np.float32)
    for b in range(B):
        for k in range(K):
            x0, y0, x1, y1 = boxes[b, k].astype(int)
            gt_masks[b, k, y0:y1, x0:x1] = 1.0
    gt_masks = jnp.asarray(gt_masks)

    t0 = time.time()
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets,
                           train=True, gt_masks=gt_masks)["params"]
    )()
    jax.block_until_ready(params)
    init_s = time.time() - t0

    tx = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = tx.init(params)

    n_iters = 10

    # chained scan: all steps inside one jit — per-call dispatch latency on
    # remote-TPU backends would otherwise dominate a dependent step loop
    @jax.jit
    def run(params, opt_state, keys, images, gt_masks):
        def step(carry, key):
            params, opt_state = carry
            def loss_fn(p):
                losses = model.apply({"params": p}, images, sizes, targets,
                                     train=True, rng_key=key, gt_masks=gt_masks)
                return sum(losses.values())
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, losses

    keys = jax.random.split(jax.random.PRNGKey(0), n_iters)
    t0 = time.time()
    out = run(params, opt_state, keys, images, gt_masks)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    t0 = time.time()
    out = run(params, opt_state, keys, images, gt_masks)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    img_s = B * n_iters / elapsed
    print(json.dumps({
        "metric": f"Mask R-CNN R50-FPN train throughput (832x1344, bs={B}/chip)",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_v100": round(img_s / 7.75, 2),
        "detail": {"backend": jax.default_backend(),
                   "ms_per_iter": round(1000 * elapsed / n_iters, 1),
                   "init_s": round(init_s, 1), "compile_s": round(compile_s, 1),
                   "reference": "detectron2 62 img/s on 8xV100 = 7.75 img/s/GPU"},
    }))


if __name__ == "__main__":
    main()
