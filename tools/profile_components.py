#!/usr/bin/env python
"""Per-component TPU timing for the IDOL inference path.

Uses the chained-scan pattern (each iteration feeds a tiny function of the
previous output back into the input) so remote-TPU async dispatch cannot fake
the timings — plain block_until_ready on axon handles misleads.

Stages are cumulative; differences give per-stage cost:
  backbone -> +proj/pos (features) -> +encoder/decoder (fwd_single) -> full
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
REPS = int(os.environ.get("REPS", "6"))


def chained(model, params, frames, sizes, stage, reps=REPS):
    def run_stage(m, x):
        if stage == "backbone":
            feats = m.backbone(x)
            return feats["res5"] if "res5" in feats else list(feats.values())[-1]
        if stage == "features":
            srcs, _, _ = m.extract_features(x, sizes)
            return srcs[0]
        if stage == "encoder":
            srcs, valid_hw, poses = m.extract_features(x, sizes)
            memory, _, _, _ = m.transformer.encode(srcs, valid_hw, poses)
            return memory
        if stage == "transformer":
            srcs, valid_hw, poses = m.extract_features(x, sizes)
            hs, *_ = m.transformer(srcs, valid_hw, poses, m.query_embed)
            return hs[-1]
        if stage == "fwd_single":
            out = m.forward_single(x, sizes, train=False)
            return out["logits"][-1]
        out = m.inference(x, sizes)
        return out["pred_logits"]

    @jax.jit
    def run(x):
        def body(carry, _):
            out = model.apply({"params": params}, carry,
                              method=lambda m, c: run_stage(m, c))
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
            return carry + fb, jnp.sum(out).astype(jnp.float32)

        final, s = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(s)

    t0 = time.time(); float(run(frames)); compile_s = time.time() - t0
    t0 = time.time(); float(run(frames)); run_s = time.time() - t0
    ms = run_s / reps * 1000
    print(f"{stage:14s} {ms:9.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    # CONFIG=<yaml> profiles another recipe (e.g. configs/idol/ytvis19_swinL.yaml)
    if os.environ.get("CONFIG"):
        cfg.merge_from_file(os.environ["CONFIG"])
        cfg.MODEL.WEIGHTS = ""
    model = build_idol_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)

    print("initializing...", flush=True)
    t0 = time.time()
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
            method=IDOL.inference,
        )["params"]
    )()
    jax.block_until_ready(params)
    print(f"init {time.time() - t0:.1f}s", flush=True)

    res = {}
    for stage in ("backbone", "features", "encoder", "transformer",
                  "fwd_single", "full"):
        res[stage] = chained(model, params, frames, sizes, stage)
    # stage differences cancel the per-sync tunnel latency shared by all rows
    res["enc_only"] = res["encoder"] - res["features"]
    res["dec_only"] = res["transformer"] - res["encoder"]
    res["heads"] = res["full"] - res["fwd_single"]
    print(json.dumps({k: round(v, 1) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
