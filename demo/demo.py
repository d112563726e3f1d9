#!/usr/bin/env python
"""Video inference + visualization demo.

Capability parity with the reference demo (demo/demo.py + demo/predictor.py
VisualizationDemo): run IDOL on a directory of video frames (or an image
sequence) and write visualized frames with per-track colors.

Usage:
    python demo/demo.py --config-file configs/idol/ytvis19_r50.yaml \
        --input /path/to/frames_dir --output /tmp/vis \
        --opts MODEL.WEIGHTS /path/to/weights
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--model-type", default="idol",
                        choices=["idol", "seqformer", "minvis"])
    parser.add_argument("--input", required=True, help="directory of frames or glob")
    parser.add_argument("--output", required=True)
    parser.add_argument("--confidence-threshold", type=float, default=0.3)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vnext_tpu.config import (add_idol_config, add_maskformer_config,
                                  add_seqformer_config, get_cfg)
    from vnext_tpu.checkpoint.checkpointer import load_weights
    from vnext_tpu.engine.vis_inference import IDOLVideoInference
    from vnext_tpu.models.idol import IDOL, build_idol_model
    from vnext_tpu.utils.visualizer import VideoVisualizer

    cfg = get_cfg()
    {"idol": add_idol_config, "seqformer": add_seqformer_config,
     "minvis": add_maskformer_config}[args.model_type](cfg)
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    frame_paths = sorted(
        glob.glob(os.path.join(args.input, "*")) if os.path.isdir(args.input) else glob.glob(args.input)
    )
    if not frame_paths:
        raise SystemExit(f"No frames found at {args.input}")
    first = np.asarray(Image.open(frame_paths[0]).convert("RGB"))
    record = {
        "file_names": frame_paths,
        "height": first.shape[0],
        "width": first.shape[1],
        "length": len(frame_paths),
        "video_id": 0,
    }

    h, w = cfg.TPU.TEST_IMAGE_SIZE
    common = dict(
        test_short_edge=cfg.INPUT.MIN_SIZE_TEST,
        test_max_size=cfg.INPUT.MAX_SIZE_TEST,
        target_size=tuple(cfg.TPU.TEST_IMAGE_SIZE),
        pixel_mean=cfg.MODEL.PIXEL_MEAN,
        pixel_std=cfg.MODEL.PIXEL_STD,
    )
    key = jax.random.PRNGKey(0)
    if args.model_type == "idol":
        model = build_idol_model(cfg)
        params = model.init(
            {"params": key}, jnp.zeros((1, h, w, 3)),
            jnp.asarray([[h, w]], jnp.int32), method=IDOL.inference,
        )["params"]
        if cfg.MODEL.WEIGHTS:
            params = load_weights(cfg.MODEL.WEIGHTS, params)
        runner = IDOLVideoInference(
            model, params,
            batch_infer_len=cfg.MODEL.IDOL.BATCH_INFER_LEN, **common)
    elif args.model_type == "seqformer":
        from vnext_tpu.engine.seqformer_inference import SeqFormerVideoInference
        from vnext_tpu.models.seqformer import SeqFormer, build_seqformer_model

        model = build_seqformer_model(cfg)
        params = model.init(
            {"params": key}, jnp.zeros((1, 1, h, w, 3)),
            jnp.asarray([[h, w]], jnp.int32), method=SeqFormer.inference,
        )["params"]
        if cfg.MODEL.WEIGHTS:
            params = load_weights(cfg.MODEL.WEIGHTS, params)
        runner = SeqFormerVideoInference(
            model, params,
            clip_matching=cfg.MODEL.SeqFormer.CLIP_MATCHING,
            clip_length=cfg.MODEL.SeqFormer.CLIP_LENGTH,
            clip_stride=cfg.MODEL.SeqFormer.CLIP_STRIDE, **common)
    else:
        from vnext_tpu.engine.minvis_inference import MinVISVideoInference
        from vnext_tpu.models.mask2former import MaskFormer, build_maskformer_model

        model = build_maskformer_model(cfg)
        params = model.init(
            {"params": key}, jnp.zeros((1, h, w, 3)),
            jnp.asarray([[h, w]], jnp.int32), method=MaskFormer.inference,
        )["params"]
        if cfg.MODEL.WEIGHTS:
            params = load_weights(cfg.MODEL.WEIGHTS, params)
        runner = MinVISVideoInference(model, params, **common)
    out = runner(record)

    os.makedirs(args.output, exist_ok=True)
    viz = VideoVisualizer()
    keep = [i for i, s in enumerate(out["pred_scores"]) if s >= args.confidence_threshold]
    for t, path in enumerate(frame_paths):
        frame = np.asarray(Image.open(path).convert("RGB"))
        tids, masks, labels, scores = [], [], [], []
        for i in keep:
            m = out["pred_masks"][i][t]
            if m is None:
                continue
            tids.append(i)
            masks.append(m)
            labels.append(out["pred_labels"][i])
            scores.append(out["pred_scores"][i])
        if masks:
            frame = viz.draw_frame(
                frame, tids,
                labels=np.asarray(labels), scores=np.asarray(scores),
                masks=np.stack(masks),
            )
        Image.fromarray(frame).save(os.path.join(args.output, os.path.basename(path)))
    print(f"Wrote {len(frame_paths)} visualized frames to {args.output}")


if __name__ == "__main__":
    main()
