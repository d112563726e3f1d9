"""MinVIS / Mask2Former (+InstMove motion) video training & eval entry point.

CLI surface parity with the reference
(projects/InstMove/MinVIS_motion/train_net_video.py:64 Trainer): trains the
frame-level MaskFormer on YTVIS-style clips and evaluates whole videos with
windowed inference + query-embedding alignment, optionally fused with the
InstMove motion cost at eval time (video_maskformer_model.py:326-338).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vnext_tpu.config import add_maskformer_config, get_cfg
from vnext_tpu.engine.launch import launch
from vnext_tpu.utils.logger import setup_logger


def default_argument_parser():
    import argparse

    parser = argparse.ArgumentParser(description="vnext_tpu video training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=0,
                        help="accepted for parity; TPU uses all visible devices")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def setup(args):
    cfg = get_cfg()
    add_maskformer_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger(cfg.OUTPUT_DIR)
    return cfg


def build_motion(cfg):
    """InstMove predictor + params (loaded from INSTMOVE.WEIGHTS when set)."""
    import jax
    import jax.numpy as jnp

    from vnext_tpu.models.instmove import InstMovePredictor

    mp = InstMovePredictor(
        memory_size=cfg.MODEL.INSTMOVE.MEMORY_SIZE,
        num_lstm_layers=cfg.MODEL.INSTMOVE.LSTM_LAYERS,
        lstm_channels=cfg.MODEL.INSTMOVE.LSTM_CHANNELS,
    )
    t = cfg.MODEL.INSTMOVE.SEQ_LEN
    h, w = cfg.MODEL.INSTMOVE.MASK_SIZE
    params = mp.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, t, h, w, 1)), jnp.zeros((1, h, w, 3)),
    )["params"]
    if cfg.MODEL.INSTMOVE.WEIGHTS:
        from vnext_tpu.checkpoint.checkpointer import load_weights

        params = load_weights(cfg.MODEL.INSTMOVE.WEIGHTS, params)
    return mp, params


def do_eval(cfg, params=None):
    import jax

    from vnext_tpu.data import build_vis_test_loader, register_all_ytvis
    from vnext_tpu.data.datasets.synthetic import register_synthetic_ytvis
    from vnext_tpu.engine.minvis_inference import MinVISVideoInference
    from vnext_tpu.evaluation import inference_on_dataset
    from vnext_tpu.evaluation.ytvis_eval import build_evaluator
    from vnext_tpu.models.mask2former import MaskFormer, build_maskformer_model

    register_all_ytvis()
    register_synthetic_ytvis()
    model = build_maskformer_model(cfg)
    if params is None:
        import jax.numpy as jnp

        h, w = cfg.TPU.TRAIN_IMAGE_SIZE
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
                method=MaskFormer.inference,
            )
        )()
        params = variables["params"]
        if cfg.MODEL.WEIGHTS:
            from vnext_tpu.checkpoint.checkpointer import load_weights

            params = load_weights(cfg.MODEL.WEIGHTS, params)

    motion_predictor = motion_params = None
    if cfg.MODEL.INSTMOVE.ENABLED:
        motion_predictor, motion_params = build_motion(cfg)

    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        loader = build_vis_test_loader(cfg, dataset_name)
        runner = MinVISVideoInference(
            model, params,
            window_size=cfg.MODEL.MASK_FORMER.TEST.WINDOW_SIZE,
            motion_predictor=motion_predictor,
            motion_params=motion_params,
            pixel_mean=cfg.MODEL.PIXEL_MEAN, pixel_std=cfg.MODEL.PIXEL_STD,
        )
        evaluator = build_evaluator(cfg, dataset_name, cfg.OUTPUT_DIR)
        results[dataset_name] = inference_on_dataset(runner, loader, evaluator)
    return results


def _minvis_batch_adapter(pixel_mean, pixel_std):
    """Clip batch -> frame-level MaskFormer inputs (key frames only).

    MinVIS trains Mask2Former per frame (video_maskformer_model.py:81 — the
    criterion sees each frame independently); the ref frame in our clip batch
    doubles the frame pool for free.
    """
    import jax.numpy as jnp

    from vnext_tpu.models.mask2former import MaskTargets

    def adapter(batch):
        import numpy as np

        imgs = np.concatenate([batch["key_image"], batch["ref_image"]])
        sizes = np.concatenate([batch["key_size"], batch["ref_size"]])
        labels = np.concatenate([batch["key_labels"], batch["ref_labels"]])
        masks = np.concatenate([batch["key_masks_s4"], batch["ref_masks_s4"]])
        valid = np.concatenate([batch["key_valid"], batch["ref_valid"]])
        x = (jnp.asarray(imgs).astype(jnp.float32) - jnp.asarray(pixel_mean)) / jnp.asarray(
            pixel_std
        )
        targets = MaskTargets(
            labels=jnp.asarray(labels), masks_s4=jnp.asarray(masks), valid=jnp.asarray(valid)
        )
        return (x, jnp.asarray(sizes), targets)

    return adapter


def do_train(cfg, resume=False):
    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.checkpointer import Checkpointer
    from vnext_tpu.data import build_vis_train_loader, register_all_ytvis
    from vnext_tpu.data.datasets.synthetic import register_synthetic_ytvis
    from vnext_tpu.engine.hooks import (
        EvalHook,
        IterationTimer,
        LRTracker,
        PeriodicCheckpointer,
        PeriodicWriter,
    )
    from vnext_tpu.engine.train_step import TrainState, make_train_step
    from vnext_tpu.engine.trainer import VISTrainer
    from vnext_tpu.models.mask2former import (
        MaskTargets,
        build_maskformer_model,
        maskformer_weight_dict,
    )
    from vnext_tpu.parallel import build_mesh, replicate
    from vnext_tpu.solver import build_lr_schedule, build_optimizer
    from vnext_tpu.utils.events import CommonMetricPrinter, JSONWriter

    register_all_ytvis()
    register_synthetic_ytvis()
    model = build_maskformer_model(cfg)
    mesh = build_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXIS_NAMES))

    h, w = cfg.TPU.TRAIN_IMAGE_SIZE
    k = cfg.TPU.MAX_INSTANCES
    dummy_t = MaskTargets(
        labels=jnp.zeros((1, k), jnp.int32),
        masks_s4=jnp.zeros((1, k, h // 4, w // 4), bool),
        valid=jnp.zeros((1, k), bool),
    )
    img = jnp.zeros((1, h, w, 3))
    sz = jnp.asarray([[h, w]], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(max(cfg.SEED, 0)), "dropout": jax.random.PRNGKey(1)},
        img, sz, dummy_t, train=False,
    )["params"]

    tx = build_optimizer(cfg, params)
    train_step = make_train_step(
        model, tx, maskformer_weight_dict(cfg), donate=cfg.TPU.DONATE_STATE
    )
    checkpointer = Checkpointer(cfg.OUTPUT_DIR)
    state = TrainState.create(params, tx)
    state, start_iter = checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, state, resume=resume)

    with mesh:
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        loader = build_vis_train_loader(cfg, seed=max(cfg.SEED, 0))
        trainer = VISTrainer(
            train_step, state, loader, jax.random.PRNGKey(max(cfg.SEED, 0)),
            batch_adapter=_minvis_batch_adapter(cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD),
        )
        trainer.register_hooks(
            [
                IterationTimer(),
                LRTracker(build_lr_schedule(cfg)),
                PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD),
                EvalHook(cfg.TEST.EVAL_PERIOD, lambda: do_eval(cfg, trainer.state.params)),
                PeriodicWriter(
                    [
                        CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
                        JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
                    ]
                ),
            ]
        )
        trainer.train(start_iter, cfg.SOLVER.MAX_ITER)
    from vnext_tpu.evaluation import verify_final_loss

    verify_final_loss(cfg, trainer)
    return trainer


def main():
    args = default_argument_parser().parse_args()
    cfg = setup(args)
    if args.eval_only:
        results = do_eval(cfg)
        if cfg.TEST.EXPECTED_RESULTS and results:
            from vnext_tpu.evaluation import verify_results

            verify_results(cfg, next(iter(results.values())) or {})
        print(results)
        return
    do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    launch(main, num_machines=1)
