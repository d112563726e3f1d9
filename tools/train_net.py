#!/usr/bin/env python
"""IDOL training/eval entry point.

CLI surface parity with the reference (projects/IDOL/train_net.py +
detectron2/engine/defaults.py:82 default_argument_parser): --config-file,
--resume, --eval-only, --num-gpus (accepted; on TPU the mesh uses all local
devices), opts KEY VALUE overrides.

TPU redesign: no process spawning — single-controller JAX over a data mesh
(jax.distributed for multi-host), one jitted SPMD train step.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def default_argument_parser():
    parser = argparse.ArgumentParser(description="vnext_tpu training")
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
    from vnext_tpu.config import add_idol_config, get_cfg
    from vnext_tpu.utils.logger import setup_logger

    cfg = get_cfg()
    add_idol_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    setup_logger(cfg.OUTPUT_DIR)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    return cfg


def do_eval(cfg, params=None):
    import jax

    from vnext_tpu.checkpoint.checkpointer import load_weights
    from vnext_tpu.data import build_vis_test_loader, register_all_ytvis
    from vnext_tpu.engine.vis_inference import IDOLVideoInference
    from vnext_tpu.evaluation import build_evaluator
    from vnext_tpu.models.idol import IDOL, build_idol_model

    register_all_ytvis()
    from vnext_tpu.data.datasets.synthetic import register_synthetic_ytvis
    register_synthetic_ytvis()
    model = build_idol_model(cfg)
    if params is None:
        h, w = cfg.TPU.TEST_IMAGE_SIZE
        import jax.numpy as jnp

        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h, w, 3)), jnp.asarray([[h, w]], jnp.int32),
            method=IDOL.inference,
        )["params"]
        if cfg.MODEL.WEIGHTS:
            params = load_weights(cfg.MODEL.WEIGHTS, params)

    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        runner = IDOLVideoInference(
            model, params,
            test_short_edge=cfg.INPUT.MIN_SIZE_TEST,
            test_max_size=cfg.INPUT.MAX_SIZE_TEST,
            target_size=tuple(cfg.TPU.TEST_IMAGE_SIZE),
            batch_infer_len=cfg.MODEL.IDOL.BATCH_INFER_LEN,
            inference_select_thres=cfg.MODEL.IDOL.INFERENCE_SELECT_THRES,
            nms_pre=cfg.MODEL.IDOL.NMS_PRE,
            add_new_score=cfg.MODEL.IDOL.ADD_NEW_SCORE,
            memory_len=cfg.MODEL.IDOL.MEMORY_LEN,
            inference_fw=cfg.MODEL.IDOL.INFERENCE_FW,
            inference_tw=cfg.MODEL.IDOL.INFERENCE_TW,
            is_multi_cls=cfg.MODEL.IDOL.MULTI_CLS_ON,
            apply_cls_thres=cfg.MODEL.IDOL.APPLY_CLS_THRES,
            temporal_score_type=cfg.MODEL.IDOL.TEMPORAL_SCORE_TYPE,
            pixel_mean=cfg.MODEL.PIXEL_MEAN,
            pixel_std=cfg.MODEL.PIXEL_STD,
            fused_tracker=cfg.TPU.FUSED_TRACKER,
            fused_capacity=cfg.TPU.FUSED_TRACKER_CAPACITY,
            fused_dets=cfg.TPU.FUSED_TRACKER_DETS,
        )
        evaluator = build_evaluator(cfg, dataset_name)
        evaluator.reset()
        for record in build_vis_test_loader(cfg, dataset_name):
            output = runner(record)
            evaluator.process([record], [output])
        results[dataset_name] = evaluator.evaluate()
    return results


def do_train(cfg, resume=False):
    import jax

    from vnext_tpu.checkpoint.checkpointer import Checkpointer
    from vnext_tpu.data import build_vis_train_loader, register_all_ytvis
    from vnext_tpu.engine.hooks import (
        EvalHook,
        IterationTimer,
        LRTracker,
        PeriodicCheckpointer,
        PeriodicWriter,
    )
    from vnext_tpu.engine.train_step import TrainState, make_train_step
    from vnext_tpu.engine.trainer import VISTrainer
    from vnext_tpu.models.criterion import default_weight_dict
    from vnext_tpu.models.idol import build_idol_model
    from vnext_tpu.parallel import build_mesh, replicate
    from vnext_tpu.solver import build_lr_schedule, build_optimizer
    from vnext_tpu.utils.events import CommonMetricPrinter, JSONWriter
    import jax.numpy as jnp
    import numpy as np

    register_all_ytvis()
    from vnext_tpu.data.datasets.synthetic import register_synthetic_ytvis
    register_synthetic_ytvis()
    if cfg.INPUT.COCO_PRETRAIN:
        from vnext_tpu.data import register_all_coco

        register_all_coco()
    model = build_idol_model(cfg)
    mesh = build_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXIS_NAMES))

    # init params with a dummy batch
    h, w = cfg.TPU.TRAIN_IMAGE_SIZE
    k = cfg.TPU.MAX_INSTANCES
    from vnext_tpu.models.criterion import Targets

    dummy_t = Targets(
        labels=jnp.zeros((1, k), jnp.int32),
        boxes=jnp.full((1, k, 4), 0.5),
        masks_s4=jnp.zeros((1, k, h // 4, w // 4), bool),
        valid=jnp.zeros((1, k), bool),
        inst_id=jnp.zeros((1, k), jnp.int32),
    )
    img = jnp.zeros((1, h, w, 3))
    sz = jnp.asarray([[h, w]], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(cfg.SEED if cfg.SEED > 0 else 0),
         "dropout": jax.random.PRNGKey(1)},
        img, sz, img, sz, dummy_t, dummy_t, train=False,
    )["params"]

    tx = build_optimizer(cfg, params)
    weight_dict = default_weight_dict(
        class_weight=cfg.MODEL.IDOL.CLASS_WEIGHT,
        l1_weight=cfg.MODEL.IDOL.L1_WEIGHT,
        giou_weight=cfg.MODEL.IDOL.GIOU_WEIGHT,
        mask_weight=cfg.MODEL.IDOL.MASK_WEIGHT,
        dice_weight=cfg.MODEL.IDOL.DICE_WEIGHT,
        reid_weight=cfg.MODEL.IDOL.REID_WEIGHT,
        dec_layers=cfg.MODEL.IDOL.DEC_LAYERS,
        deep_supervision=cfg.MODEL.IDOL.DEEP_SUPERVISION,
    )
    train_step = make_train_step(model, tx, weight_dict, donate=cfg.TPU.DONATE_STATE)

    checkpointer = Checkpointer(cfg.OUTPUT_DIR)
    state = TrainState.create(params, tx)
    state, start_iter = checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, state, resume=resume)

    with mesh:
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        mapper = None
        if cfg.INPUT.COCO_PRETRAIN:
            from vnext_tpu.data import CocoClipDatasetMapper

            mapper = CocoClipDatasetMapper.from_config(cfg, is_train=True)
        loader = build_vis_train_loader(cfg, mapper=mapper, seed=max(cfg.SEED, 0))
        trainer = VISTrainer(
            train_step, state, loader, jax.random.PRNGKey(max(cfg.SEED, 0)),
            pixel_mean=cfg.MODEL.PIXEL_MEAN, pixel_std=cfg.MODEL.PIXEL_STD,
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
    # dispatch: image meta-archs go through the generic detection driver
    # (reference: one tools/train_net.py Trainer serves every meta-arch)
    from vnext_tpu.engine.detection import _ARCH, do_eval_detection, do_train_detection

    if cfg.MODEL.META_ARCHITECTURE in _ARCH:
        from vnext_tpu.data import register_all_coco
        from vnext_tpu.data.datasets.synthetic import register_synthetic_coco

        register_all_coco()
        register_synthetic_coco()  # quick-schedule smoke-test dataset
        if args.eval_only:
            results = do_eval_detection(cfg)
            print(results)
            return
        do_train_detection(cfg, resume=args.resume)
        return
    if args.eval_only:
        results = do_eval(cfg)
        if cfg.TEST.EXPECTED_RESULTS and results:
            from vnext_tpu.evaluation import verify_results

            verify_results(cfg, next(iter(results.values())) or {})
        print(results)
        return
    do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
