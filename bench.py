"""Benchmark suite: one JSON line per metric, the driver headline LAST.

Headline (printed last so tail/last-line parsers pick it up):
  IDOL-R50 per-clip inference throughput (frames/sec/chip) at realistic YTVIS
  eval shapes (480x864 padded, clip length 10).

Extras (printed first, each as its own JSON line; also summarized in the
headline's detail.suite and written to BENCH_SUITE.json):
  - IDOL-R50 train step ms/iter (single-chip share of the 8-chip recipe)
  - SeqFormer-R50 whole-clip inference fps
  - MinVIS/Mask2Former-R50 frame inference fps
  - InstMove motion-predictor multi-clip batched throughput (BASELINE cfg 5)
  - IDOL-Swin-L clip inference fps + peak HBM (BASELINE cfgs 3-4 scale)

Baseline context: the reference publishes no IDOL inference FPS (BASELINE.md);
``vs_baseline`` for the headline uses the IDOL paper's commonly cited ~30 FPS
single-GPU figure as a stand-in.

Budget: extras are skipped once VNEXT_BENCH_BUDGET_S (default 2400s) elapses;
a failing extra prints an error line and never kills the headline.
"""

import gc
import json
import os
import sys
import time
import traceback

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
T0 = time.time()
BUDGET_S = float(os.environ.get("VNEXT_BENCH_BUDGET_S", "2400"))


def _peak_hbm_gb():
    try:
        stats = jax.devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def _sync(out):
    """True host sync: pull ONE scalar derived from the output tree.

    ``jax.block_until_ready`` does NOT truly block on the axon tunnel
    (docs/ROUND3.md "Axon tunnel timing model"); a ``float()`` scalar pull
    does, at a fixed ~30 ms RPC cost.  The device stream is in-order, so a
    scalar from the last dispatch closes every prior dispatch too.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.reshape(leaf, (-1,))[0].astype(jnp.float32))


def _measure(call, iters):
    """Time ``iters`` async dispatches of ``call()`` closed by a scalar pull,
    minus a measured null-sync baseline (the pull on already-ready data).

    Returns (seconds_per_iter, detail_dict).  This is the sync-corrected
    pattern validated in tools/sweep_msda_v9.py; 4 of 6 round-3 suite numbers
    were fiction because they closed with block_until_ready instead.
    """
    out = call()
    _sync(out)  # post-compile warmup: everything resident, queue drained
    t0 = time.time()
    for _ in range(3):
        _sync(out)
    sync_s = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(iters):
        out = call()
    _sync(out)
    dt = max(time.time() - t0 - sync_s, 1e-9) / iters
    return dt, {
        "sync": "scalar-pull minus null-baseline",
        "n_dispatches": iters,
        "sync_baseline_ms": round(sync_s * 1000, 1),
    }


def bench_idol_infer():
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
    _sync(out)
    compile_s = time.time() - t0

    # cross-check at two window lengths: steady-state must agree within noise
    dt8, _ = _measure(lambda: infer_jit(params, frames, sizes), 8)
    dt, sync_detail = _measure(lambda: infer_jit(params, frames, sizes), 24)
    elapsed, n_iters = dt * 24, 24
    fps = CLIP_LEN / dt

    # utilization: XLA compiled-graph FLOPs (pallas kernels contribute their
    # declared CostEstimate = typical-case executed selector-matmul flops)
    # over v5e bf16 peak 197 TF/s/chip
    try:
        cost = jax.jit(infer).lower(params, frames, sizes).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    peak = 197e12
    mfu = flops / (elapsed / n_iters) / peak if flops else None

    return {
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
            "msda_kernel": (
                "v8" if os.environ.get("VNEXT_MSDA_V8", "0") == "1"
                else "v9" if os.environ.get("VNEXT_MSDA_V9", "1") == "1"
                else "v7"
            ),
            "per_clip_ms_n8_crosscheck": round(dt8 * 1000, 1),
            **sync_detail,
        },
    }


def bench_idol_batched():
    """Eval-workload throughput: 4 clips (40 frames) per jit dispatch.

    IDOL.inference treats the clip/frame axis as a pure batch (idol.py:289 in
    the reference sense — per-frame outputs are numerically identical at any
    batch), so a chip evaluating a dataset amortizes the per-dispatch floor by
    batching clips. This is the serving-shaped reading of the north-star
    "frames/sec/chip"; the headline metric stays single-clip.
    """
    from vnext_tpu.models import IDOL
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.config import get_cfg, add_idol_config

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)
    t = 4 * CLIP_LEN
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (t, H, W, 3)), jnp.uint8)
    sizes = jnp.asarray([[H, W - 11]] * t, jnp.int32)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])

    def infer(params, imgs, szs):
        x = (imgs.astype(jnp.float32) - mean) / std
        return model.apply({"params": params}, x, szs, method=IDOL.inference)

    init_imgs = (frames[:1].astype(jnp.float32) - mean) / std
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, init_imgs, sizes[:1], method=IDOL.inference
        )
    )()["params"]
    jax.block_until_ready(params)
    infer_jit = jax.jit(infer)
    t0 = time.time()
    _sync(infer_jit(params, frames, sizes))
    compile_s = time.time() - t0
    dt, sync_detail = _measure(lambda: infer_jit(params, frames, sizes), 8)
    return {
        "metric": "IDOL-R50 batched-clip inference throughput (480x864, 4 clips/dispatch)",
        "value": round(t / dt, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(t / dt / BASELINE_FPS, 3),
        "detail": {
            "frames_per_dispatch": t,
            "per_dispatch_ms": round(dt * 1000, 1),
            "compile_s": round(compile_s, 1),
            **sync_detail,
        },
    }


def bench_idol_train():
    from vnext_tpu.config import get_cfg, add_idol_config
    from vnext_tpu.engine.train_step import TrainState, make_train_step
    from vnext_tpu.models.criterion import Targets, default_weight_dict
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.solver import build_optimizer

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.merge_from_file("configs/idol/ytvis19_r50.yaml")
    cfg.MODEL.WEIGHTS = ""
    model = build_idol_model(cfg)
    h, w = cfg.TPU.TRAIN_IMAGE_SIZE
    k = cfg.TPU.MAX_INSTANCES
    b = max(1, cfg.SOLVER.IMS_PER_BATCH // 8)  # single-chip share of 8-chip recipe
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
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images[:1], sizes[:1], images[:1], sizes[:1],
            jax.tree_util.tree_map(lambda x: x[:1], targets),
            jax.tree_util.tree_map(lambda x: x[:1], targets), train=False,
        )["params"]
    )()
    tx = build_optimizer(cfg, params)
    step = make_train_step(
        model, tx, default_weight_dict(dec_layers=cfg.MODEL.IDOL.DEC_LAYERS), donate=False
    )
    state = TrainState.create(params, tx)
    batch = (images, sizes, images, sizes, targets, targets)
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    float(m["total_loss"])
    compile_s = time.time() - t0

    def call():
        nonlocal state
        state, m = step(state, batch, jax.random.PRNGKey(0))
        return m["total_loss"]

    dt, sync_detail = _measure(call, 8)
    return {
        "metric": "IDOL-R50 train step (single-chip share of 8-chip recipe)",
        "value": round(dt * 1000, 1),
        "unit": "ms/iter",
        "vs_baseline": None,
        "detail": {
            "batch_clips_per_chip": int(b),
            "clip_frames": 2,
            "resolution": [int(h), int(w)],
            "frames_per_sec": round(2 * b / dt, 2),
            "compile_s": round(compile_s, 1),
            **sync_detail,
        },
    }


def bench_seqformer():
    from vnext_tpu.models.seqformer import SeqFormer, build_seqformer_model
    from vnext_tpu.config import get_cfg, add_seqformer_config

    cfg = get_cfg()
    add_seqformer_config(cfg)
    cfg.MODEL.SeqFormer.NUM_CLASSES = 40
    model = build_seqformer_model(cfg)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(1, CLIP_LEN, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]], jnp.int32)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:, :1], sizes, method=SeqFormer.inference
        )["params"]
    )()
    infer = jax.jit(
        lambda p, f, s: model.apply({"params": p}, f, s, method=SeqFormer.inference)
    )
    dt, sync_detail = _measure(lambda: infer(params, frames, sizes), 16)
    return {
        "metric": "SeqFormer-R50 whole-clip inference (480x864, clip=10)",
        "value": round(CLIP_LEN / dt, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "detail": {"per_clip_ms": round(dt * 1000, 1), **sync_detail},
    }


def bench_minvis():
    from vnext_tpu.models.mask2former import MaskFormer, build_maskformer_model
    from vnext_tpu.config import get_cfg, add_maskformer_config

    cfg = get_cfg()
    add_maskformer_config(cfg)
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 40
    model = build_maskformer_model(cfg)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(CLIP_LEN, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * CLIP_LEN, jnp.int32)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
            method=MaskFormer.inference,
        )["params"]
    )()
    infer = jax.jit(
        lambda p, f, s: model.apply({"params": p}, f, s, method=MaskFormer.inference)
    )
    dt, sync_detail = _measure(lambda: infer(params, frames, sizes), 16)
    return {
        "metric": "MinVIS/Mask2Former-R50 frame inference (480x864, 10 frames/call)",
        "value": round(CLIP_LEN / dt, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "detail": {"per_batch_ms": round(dt * 1000, 1), **sync_detail},
    }


def bench_instmove():
    """BASELINE config 5: motion-model multi-clip batched throughput."""
    from vnext_tpu.models.instmove import InstMovePredictor

    model = InstMovePredictor(dtype=jnp.bfloat16)
    b, t, hh, ww = 32, 4, 128, 128   # 32 instance-clips per dispatch
    rng = np.random.RandomState(0)
    masks = jnp.asarray(rng.rand(b, t, hh, ww, 1) > 0.7, jnp.float32)
    image = jnp.asarray(rng.randn(b, hh, ww, 3), jnp.float32)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), masks[:1], image[:1])["params"]
    )()
    fwd = jax.jit(lambda p, m, im: model.apply({"params": p}, m, im))
    dt, sync_detail = _measure(lambda: fwd(params, masks, image), 32)
    return {
        "metric": "InstMove motion-predictor batched throughput (B=32, 4 past masks, 128x128)",
        "value": round(b / dt, 1),
        "unit": "instance-clips/sec/chip",
        "vs_baseline": None,
        "detail": {"per_batch_ms": round(dt * 1000, 1), **sync_detail},
    }


def bench_swinl():
    """BASELINE cfgs 3-4 scale: IDOL-Swin-L at full eval shapes."""
    from vnext_tpu.models import IDOL
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.config import get_cfg, add_idol_config

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.merge_from_file("configs/idol/ytvis19_swinL.yaml")
    cfg.MODEL.WEIGHTS = ""
    model = build_idol_model(cfg)
    assert model.backbone_type == "swin", "config must select the Swin backbone"
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(CLIP_LEN, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * CLIP_LEN, jnp.int32)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1], method=IDOL.inference
        )["params"]
    )()
    _sync(params)
    infer = jax.jit(lambda p, f, s: model.apply({"params": p}, f, s, method=IDOL.inference))
    t0 = time.time()
    out = infer(params, frames, sizes)
    _sync(out)
    compile_s = time.time() - t0
    dt, sync_detail = _measure(lambda: infer(params, frames, sizes), 8)
    return {
        "metric": "IDOL-Swin-L clip inference throughput (480x864, clip=10)",
        "value": round(CLIP_LEN / dt, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "detail": {
            "per_clip_ms": round(dt * 1000, 1),
            "peak_hbm_gb": _peak_hbm_gb(),
            "compile_s": round(compile_s, 1),
            **sync_detail,
        },
    }


EXTRAS = [
    ("idol_train", bench_idol_train),
    ("seqformer", bench_seqformer),
    ("minvis", bench_minvis),
    ("instmove", bench_instmove),
    ("swinl", bench_swinl),
    ("idol_infer_batched", bench_idol_batched),
]


def main():
    headline = bench_idol_infer()
    suite = {"idol_infer": {k: headline[k] for k in ("metric", "value", "unit")}}

    if os.environ.get("VNEXT_BENCH_SUITE", "1") == "1":
        for name, fn in EXTRAS:
            if time.time() - T0 > BUDGET_S:
                suite[name] = {"skipped": "budget"}
                continue
            try:
                r = fn()
                suite[name] = {k: r[k] for k in ("metric", "value", "unit")}
                print(json.dumps(r), flush=True)
            except Exception as e:
                suite[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"[bench] {name} failed: {e}", file=sys.stderr, flush=True)
                traceback.print_exc(file=sys.stderr)
            gc.collect()

        try:
            with open("BENCH_SUITE.json", "w") as f:
                json.dump(suite, f, indent=1)
        except Exception:
            pass

    headline["detail"]["suite"] = {
        k: (f"{v['value']} {v['unit']}" if "value" in v else v)
        for k, v in suite.items()
    }
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
