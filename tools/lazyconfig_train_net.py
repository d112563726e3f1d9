#!/usr/bin/env python
"""Training entry for python-file ("lazy") configs.

Capability parity with tools/lazyconfig_train_net.py:107 in the reference: load a
python config with LazyConfig, apply dotted overrides, instantiate the model, and
run the same training loop as tools/train_net.py.

A lazy config must define: ``model`` (LazyCall node building a flax module),
``train`` (dict with max_iter, output_dir, ...), and optionally ``dataloader``
and ``optimizer`` nodes. See configs/idol/lazy_example.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", nargs="*", default=[])
    args = parser.parse_args()

    from vnext_tpu.config import LazyConfig, instantiate
    from vnext_tpu.utils.logger import setup_logger

    cfg = LazyConfig.load(args.config_file)
    if args.opts:
        LazyConfig.apply_overrides(cfg, args.opts)

    output_dir = cfg.train.get("output_dir", "./output")
    os.makedirs(output_dir, exist_ok=True)
    setup_logger(output_dir)
    LazyConfig.save(cfg, os.path.join(output_dir, "config.yaml"))

    model = instantiate(cfg.model)
    entry = cfg.train.get("entry")
    if entry is not None:
        # configs may define their own train entry: a LazyCall node receiving the model
        runner = instantiate(entry)
        return runner(model=model, cfg=cfg, resume=args.resume, eval_only=args.eval_only)
    raise SystemExit(
        "Lazy config must define train.entry (a LazyCall of a training function)."
    )


if __name__ == "__main__":
    main()
