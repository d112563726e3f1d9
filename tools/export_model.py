#!/usr/bin/env python
"""Export a trained model to a serialized StableHLO artifact
(reference surface: tools/deploy/export_model.py — TorchScript/caffe2 tracing;
the TPU-native deployable is a `jax.export` StableHLO program that any PJRT
runtime can load and run without Python model code).

Usage:
    python tools/export_model.py --config-file configs/idol/ytvis19_r50.yaml \
        --output /tmp/idol.stablehlo [--height 480 --width 864 --frames 10] \
        [--opts MODEL.WEIGHTS weights/x.pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=864)
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.checkpointer import load_weights
    from vnext_tpu.config import add_idol_config, add_seqformer_config, get_cfg
    from vnext_tpu.export import export_stablehlo, save_exported
    from vnext_tpu.models import build_model
    from vnext_tpu.models.idol import IDOL

    cfg = get_cfg()
    add_idol_config(cfg)
    try:
        add_seqformer_config(cfg)
    except Exception:
        pass
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_model(cfg)
    t, h, w = args.frames, args.height, args.width
    frames = jnp.zeros((t, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]] * t, jnp.int32)
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
                           method=type(model).inference)["params"]
    )()
    if cfg.MODEL.WEIGHTS:
        params = load_weights(cfg.MODEL.WEIGHTS, params)

    def infer(params, frames, sizes):
        return model.apply({"params": params}, frames, sizes,
                           method=type(model).inference)

    exported = export_stablehlo(infer, (params, frames, sizes))
    save_exported(exported, args.output)
    print(f"Exported {cfg.MODEL.META_ARCHITECTURE} inference "
          f"({t}x{h}x{w}) to {args.output}")


if __name__ == "__main__":
    main()
