#!/usr/bin/env python
"""Video inference + visualization demo.

Capability parity with the reference demo (demo/demo.py + demo/predictor.py
VisualizationDemo): run IDOL on a directory of video frames (or an image
sequence) and write visualized frames with per-track colors.

Usage (frame directory):
    python demo/demo.py --config-file configs/idol/ytvis19_r50.yaml \
        --input /path/to/frames_dir --output /tmp/vis \
        --opts MODEL.WEIGHTS /path/to/weights

Usage (video file; MJPEG-AVI natively, other codecs when cv2 is installed):
    python demo/demo.py --config-file configs/idol/ytvis19_r50.yaml \
        --video-input clip.avi --video-output /tmp/vis.avi

Reference: demo/demo.py + demo/predictor.py (VisualizationDemo, --video-input,
AsyncPredictor). Visualization/encoding runs in an AsyncPredictor worker so it
overlaps the per-frame mask materialization.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run_webcam(args, runner, cam_buffer, chunk):
    """Live camera loop (reference demo/demo.py:98 --webcam): capture a clip,
    run the video model on it, show/write annotated frames, repeat until
    q/ESC or --webcam-max-frames. Track identities are per-clip (the runner
    associates within a clip); the visualizer keeps colors stable by id."""
    import cv2

    from vnext_tpu.utils.visualizer import VideoVisualizer

    cap = cv2.VideoCapture(args.webcam_device)
    if not cap.isOpened():
        raise SystemExit(f"cannot open camera device {args.webcam_device}")
    viz = VideoVisualizer()
    writer = None
    processed = 0
    display = bool(os.environ.get("DISPLAY"))
    try:
        stop = False
        while not stop:
            paths = []
            for _ in range(chunk):
                ok, bgr = cap.read()
                if not ok:
                    stop = True
                    break
                name = f"cam_{processed + len(paths):08d}"
                cam_buffer[name] = np.ascontiguousarray(bgr[:, :, ::-1])
                paths.append(name)
                if (args.webcam_max_frames
                        and processed + len(paths) >= args.webcam_max_frames):
                    stop = True
                    break
            if not paths:
                break
            h, w = cam_buffer[paths[0]].shape[:2]
            out = runner({"file_names": paths, "height": h, "width": w,
                          "length": len(paths), "video_id": 0})
            keep = [i for i, s in enumerate(out["pred_scores"])
                    if s >= args.confidence_threshold]
            for t, p in enumerate(paths):
                frame = np.ascontiguousarray(cam_buffer[p])
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
                        frame, tids, labels=np.asarray(labels),
                        scores=np.asarray(scores), masks=np.stack(masks),
                    )
                if args.video_output:
                    if writer is None:
                        from vnext_tpu.utils.video_io import VideoWriter

                        writer = VideoWriter(args.video_output, fps=25.0)
                    writer.write(frame)
                if args.output:
                    os.makedirs(args.output, exist_ok=True)
                    Image.fromarray(frame).save(
                        os.path.join(args.output, f"{p}.png"))
                if display:
                    cv2.imshow("vnext_tpu demo", frame[:, :, ::-1])
                    if cv2.waitKey(1) & 0xFF in (ord("q"), 27):
                        stop = True
                processed += 1
            for p in paths:
                cam_buffer.pop(p, None)
    finally:
        cap.release()
        if writer is not None:
            writer.close()
        if display:
            cv2.destroyAllWindows()
    print(f"Processed {processed} webcam frames")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--model-type", default="idol",
                        choices=["idol", "seqformer", "minvis"])
    parser.add_argument("--input", help="directory of frames or glob")
    parser.add_argument("--video-input", help="video file (MJPEG-AVI without cv2)")
    parser.add_argument("--webcam", action="store_true",
                        help="live camera input (reference demo.py --webcam); "
                             "processes rolling clips and shows/writes results")
    parser.add_argument("--webcam-device", type=int, default=0)
    parser.add_argument("--webcam-max-frames", type=int, default=0,
                        help="stop after this many frames (0 = until q/ESC)")
    parser.add_argument("--output", help="output directory for visualized frames")
    parser.add_argument("--video-output", help="output video file (MJPEG-AVI)")
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

    if not (args.input or args.video_input or args.webcam):
        raise SystemExit("one of --input / --video-input / --webcam is required")
    if not (args.output or args.video_output or args.webcam):
        raise SystemExit("one of --output / --video-output is required")

    fps = 25.0
    cam_buffer = {}
    if args.webcam:
        # frames arrive live; the runner's image_loader indexes the capture
        # buffer filled by _run_webcam below
        frame_paths = []
        load_frame = lambda p: cam_buffer[p]
    elif args.video_input:
        from vnext_tpu.utils.video_io import read_video

        video_frames, fps = read_video(args.video_input)
        frame_paths = [f"frame_{t:06d}.jpg" for t in range(len(video_frames))]
        load_frame = lambda p: video_frames[int(p[6:12])]
    else:
        frame_paths = sorted(
            glob.glob(os.path.join(args.input, "*")) if os.path.isdir(args.input) else glob.glob(args.input)
        )
        if not frame_paths:
            raise SystemExit(f"No frames found at {args.input}")
        load_frame = lambda p: np.asarray(Image.open(p).convert("RGB"))
    if not args.webcam:
        first = load_frame(frame_paths[0])
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
        image_loader=load_frame,
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

    if args.webcam:
        chunk = (cfg.MODEL.IDOL.BATCH_INFER_LEN if args.model_type == "idol"
                 else cfg.MODEL.SeqFormer.CLIP_LENGTH
                 if args.model_type == "seqformer" else 8)
        _run_webcam(args, runner, cam_buffer, max(int(chunk), 2))
        return

    out = runner(record)

    from vnext_tpu.engine.predictor import AsyncPredictor

    viz = VideoVisualizer()
    keep = [i for i, s in enumerate(out["pred_scores"]) if s >= args.confidence_threshold]

    def visualize(item):
        t, path = item
        frame = np.ascontiguousarray(load_frame(path))
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
        return frame

    # visualization overlaps IO through the async worker (predictor.py parity
    # with the reference demo's AsyncPredictor)
    worker = AsyncPredictor(visualize, queue_size=8)
    writer = None
    if args.video_output:
        from vnext_tpu.utils.video_io import VideoWriter

        writer = VideoWriter(args.video_output, fps=fps)
    if args.output:
        os.makedirs(args.output, exist_ok=True)

    n_in_flight = 0
    results_written = 0
    for t, path in enumerate(frame_paths):
        worker.put((t, path))
        n_in_flight += 1
        while n_in_flight > 4 or (t == len(frame_paths) - 1 and n_in_flight):
            frame = worker.get()
            idx = results_written
            if writer is not None:
                writer.write(frame)
            if args.output:
                Image.fromarray(frame).save(
                    os.path.join(args.output, os.path.basename(frame_paths[idx]))
                )
            results_written += 1
            n_in_flight -= 1
    worker.shutdown()
    if writer is not None:
        writer.close()
        print(f"Wrote visualized video to {args.video_output}")
    if args.output:
        print(f"Wrote {results_written} visualized frames to {args.output}")


if __name__ == "__main__":
    main()
