#!/usr/bin/env python
"""Per-component TPU timing for the IDOL inference path.

Times each stage separately (backbone, input projections, encoder, decoder,
mask-feature tower, dynamic mask head, full pipeline) on real eval shapes, to
locate the throughput bottleneck.
"""

import sys, os, time, json

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models import IDOL
from vnext_tpu.models.idol import build_idol_model
from vnext_tpu.config import get_cfg, add_idol_config

T, H, W = 10, 480, 864


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt * 1000:9.1f} ms", flush=True)
    return out, dt


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)

    print("initializing...", flush=True)
    t0 = time.time()
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1], method=IDOL.inference
        )["params"]
    )()
    jax.block_until_ready(params)
    print(f"init {time.time() - t0:.1f}s", flush=True)

    # ---- stage closures via Module.apply(method=...)
    def backbone_only(p, x):
        return model.apply({"params": p}, x, method=lambda m, x: m.backbone(x))

    def features(p, x, s):
        return model.apply({"params": p}, x, s, method=IDOL.extract_features)

    def fwd_single(p, x, s):
        return model.apply(
            {"params": p}, x, s, False, method=IDOL.forward_single
        )

    def full(p, x, s):
        return model.apply({"params": p}, x, s, method=IDOL.inference)

    def mask_part(p, x, s):
        def run(m, x, s):
            out = m.forward_single(x, s, False)
            mask_feats = m._mask_features(out["memory"], out["spatial_shapes"])
            from vnext_tpu.models.condinst import run_dynamic_mask_head

            pars = m.controller(out["hs"][-1])
            ref = out["pre_refs"][-1] * s[:, ::-1].astype(jnp.float32)[:, None, :]
            return run_dynamic_mask_head(mask_feats, ref, pars)

        return model.apply({"params": p}, x, s, method=run)

    fb = jax.jit(backbone_only)
    ff = jax.jit(features)
    fs = jax.jit(fwd_single)
    fm = jax.jit(mask_part)
    fa = jax.jit(full)

    results = {}
    print("compiling+timing backbone...", flush=True)
    _, results["backbone"] = timeit(fb, params, frames, name="backbone (10f)")
    _, results["features"] = timeit(ff, params, frames, sizes, name="backbone+proj+pos")
    _, results["fwd_single"] = timeit(fs, params, frames, sizes, name="+ transformer enc/dec")
    _, results["mask"] = timeit(fm, params, frames, sizes, name="+ mask head (all queries)")
    _, results["full"] = timeit(fa, params, frames, sizes, name="full inference")
    print(json.dumps({k: round(v * 1000, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
