#!/usr/bin/env python
"""Model analysis CLI (reference surface: tools/analyze_model.py — FLOPs,
activations, parameters, structure)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--tasks", nargs="+", default=["parameter", "flop", "structure"],
                        choices=["parameter", "flop", "structure"])
    parser.add_argument("--image-size", type=int, nargs=2, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vnext_tpu.config import add_idol_config, get_cfg
    from vnext_tpu.models.idol import IDOL, build_idol_model
    from vnext_tpu.utils.analysis import flop_count, parameter_count, parameter_count_table

    cfg = get_cfg()
    add_idol_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_idol_model(cfg)
    h, w = args.image_size or cfg.TPU.TEST_IMAGE_SIZE
    frames = jnp.zeros((1, h, w, 3))
    sizes = jnp.asarray([[h, w]], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, frames, sizes, method=IDOL.inference
    )["params"]

    if "parameter" in args.tasks:
        print(f"total parameters: {parameter_count(params) / 1e6:.2f}M")
    if "structure" in args.tasks:
        print(parameter_count_table(params))
    if "flop" in args.tasks:
        cost = flop_count(
            lambda p, x, s: model.apply({"params": p}, x, s, method=IDOL.inference),
            params, frames, sizes,
        )
        print(f"inference flops @ {h}x{w}: {cost['flops'] / 1e9:.2f} GFLOPs")
        print(f"bytes accessed: {cost['bytes accessed'] / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
