#!/usr/bin/env python
"""Chained (dependency-forced) per-component timing on real TPU shapes."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np

T, H, W = 10, 480, 864
REPS = 4

def chained_time(make_fn, init_x, name, n=REPS):
    """make_fn returns f(x)->(x_feedback, scalar). Scan n times, fetch scalar."""
    @jax.jit
    def run(x):
        def body(carry, _):
            nx, s = make_fn(carry)
            return nx, s
        final, ss = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(ss)
    t0 = time.time(); float(run(init_x)); compile_t = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time(); float(run(init_x)); ts.append(time.time() - t0)
    per = min(ts) / n * 1000
    print(f"{name:40s} {per:9.1f} ms/iter   (compile {compile_t:.0f}s)", flush=True)
    return per

def main():
    from vnext_tpu.models import IDOL
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.config import get_cfg, add_idol_config
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp

    rng = np.random.RandomState(0)

    # 1. raw msda core at encoder scale (10 frames folded into batch), bf16
    shapes = ((60, 108), (30, 54), (15, 27), (8, 14))
    S = sum(h * w for h, w in shapes)
    M, D, P = 8, 32, 4
    val = jnp.asarray(rng.randn(T, S, M, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(T, S, M, 4, P, 2), jnp.float32)
    attn = jnp.asarray(rng.rand(T, S, M, 4, P), jnp.bfloat16)

    def msda_fn(v):
        out = ms_deform_attn_core_jnp(v, shapes, loc, attn)
        fb = (jnp.mean(out) * 1e-6).astype(v.dtype)
        return v + fb, jnp.sum(out).astype(jnp.float32)
    chained_time(msda_fn, val, "msda core enc-scale x10f bf16")

    # 2. backbone only
    cfg = get_cfg(); add_idol_config(cfg); cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)
    params = jax.jit(lambda: model.init({"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1], method=IDOL.inference)["params"])()
    jax.block_until_ready(params)
    print("model init done", flush=True)

    def bb_fn(x):
        feats = model.apply({"params": params}, x, method=lambda m, im: m.backbone(im))
        s = jnp.sum(feats["res5"]).astype(jnp.float32)
        return x + (s * 1e-20).astype(x.dtype), s
    chained_time(bb_fn, frames, "backbone 10f")

    # 3. forward_single (backbone + transformer + heads, no masks)
    def fs_fn(x):
        out = model.apply({"params": params}, x, sizes, False, method=IDOL.forward_single)
        s = jnp.sum(out["logits"]).astype(jnp.float32)
        return x + (s * 1e-20).astype(x.dtype), s
    chained_time(fs_fn, frames, "forward_single (bb+transformer)")

if __name__ == "__main__":
    main()
