#!/usr/bin/env python
"""Minimal explicit training loop without the Trainer/hook machinery
(CLI surface parity with tools/plain_train_net.py in the reference: the
"write your own loop" template, do_train:113 style).

Everything is spelled out inline — config, model build, jitted step, metric
logging, periodic checkpointing — so users who outgrow VISTrainer can copy
and edit this file."""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger("vnext_tpu")


def do_train(cfg, resume: bool = False):
    import jax
    import numpy as np

    from vnext_tpu.checkpoint.checkpointer import Checkpointer
    from vnext_tpu.data import build_vis_train_loader
    from vnext_tpu.engine.train_step import TrainState, make_train_step
    from vnext_tpu.engine.trainer import batch_to_model_inputs
    from vnext_tpu.models.criterion import default_weight_dict
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.solver.build import build_optimizer
    from vnext_tpu.utils.events import EventStorage

    model = build_idol_model(cfg)
    loader = build_vis_train_loader(cfg)
    data_iter = iter(loader)
    batch = next(data_iter)
    inputs = batch_to_model_inputs(batch, cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD)

    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    params = jax.jit(lambda: model.init(rng, *inputs, train=True)["params"])()
    tx = build_optimizer(cfg, params)
    state = TrainState.create(params=params, tx=tx)
    step_fn = make_train_step(model, tx, default_weight_dict(cfg))

    checkpointer = Checkpointer(cfg.OUTPUT_DIR)
    state, start_iter = checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, state,
                                                    resume=resume)
    max_iter = cfg.SOLVER.MAX_ITER
    logger.info("Starting plain training from iter %d to %d", start_iter, max_iter)
    with EventStorage(start_iter) as storage:
        t0 = time.perf_counter()
        it = start_iter
        while it < max_iter:
            if it > start_iter:  # first batch already drawn for init
                batch = next(data_iter)
                inputs = batch_to_model_inputs(batch, cfg.MODEL.PIXEL_MEAN,
                                               cfg.MODEL.PIXEL_STD)
            state, metrics = step_fn(state, inputs, rng)
            it += 1
            if it % 20 == 0 or it == max_iter:
                host = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(host.get("total_loss", 0.0)):
                    raise FloatingPointError(f"non-finite loss at iter {it}: {host}")
                for k, v in host.items():
                    storage.put_scalar(k, v)
                rate = 20 / max(time.perf_counter() - t0, 1e-9)
                t0 = time.perf_counter()
                logger.info("iter %d  %s  (%.2f it/s)", it,
                            "  ".join(f"{k}={v:.4f}" for k, v in sorted(host.items())),
                            rate)
            if it % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or it == max_iter:
                checkpointer.save(f"model_{it:07d}", state)
            storage.step()
    return state


def main():
    from train_net import default_argument_parser, setup

    args = default_argument_parser().parse_args()
    cfg = setup(args)

    from vnext_tpu.data import register_all_ytvis

    register_all_ytvis()
    if args.eval_only:
        from train_net import do_eval

        return do_eval(cfg)
    do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
