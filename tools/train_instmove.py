"""InstMove motion-predictor training (reference: projects/InstMove training —
model_withImgR6 Predictor fit on GT instance-mask sequences + the target-frame
image, BCE + dice on the predicted next mask).

Consumes any registered YTVIS-format dataset: per track, every run of
SEQ_LEN+1 consecutive frames with masks becomes one sample; masks are cropped
around the sequence's union box (2x margin) and resized to INSTMOVE.MASK_SIZE,
exactly the object-centric normalization the reference trains with.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from collections import defaultdict

import numpy as np


def default_argument_parser():
    import argparse

    parser = argparse.ArgumentParser(description="InstMove predictor training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def _rasterize(anno, h, w):
    segm = anno.get("segmentation")
    if segm is None:
        return None
    if isinstance(segm, dict):
        from vnext_tpu.evaluation.rle import rle_decode

        return rle_decode(segm)
    from vnext_tpu.structures.masks import polygons_to_bitmask

    return polygons_to_bitmask([np.asarray(p) for p in segm], h, w)


def _crop_resize(mask, box, out_hw):
    from PIL import Image

    x0, y0, x1, y1 = [int(v) for v in box]
    patch = mask[y0:y1, x0:x1].astype(np.uint8) * 255
    img = Image.fromarray(patch).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    return (np.asarray(img) > 127).astype(np.float32)


def build_mask_sequences(dataset_name: str, seq_len: int, mask_hw, limit=None):
    """[(past [T, h, w], target [h, w], image_file or None, crop_box)]"""
    from vnext_tpu.data.catalog import DatasetCatalog

    samples = []
    for rec in DatasetCatalog.get(dataset_name):
        h, w = rec["height"], rec["width"]
        tracks = defaultdict(dict)
        for fi, frame_annos in enumerate(rec["annotations"] or []):
            for a in frame_annos or []:
                tracks[a["id"]][fi] = a
        for frames in tracks.values():
            for start in range(rec["length"] - seq_len):
                window = [frames.get(start + i) for i in range(seq_len + 1)]
                if any(x is None for x in window):
                    continue
                masks = [_rasterize(a, h, w) for a in window]
                if any(m is None or not m.any() for m in masks):
                    continue
                union = np.stack(masks).any(0)
                ys, xs = np.nonzero(union)
                cy, cx = (ys.min() + ys.max()) / 2, (xs.min() + xs.max()) / 2
                half = max(ys.max() - ys.min(), xs.max() - xs.min(), 16)
                box = [
                    max(int(cx - half), 0), max(int(cy - half), 0),
                    min(int(cx + half), w), min(int(cy + half), h),
                ]
                crops = [_crop_resize(m, box, mask_hw) for m in masks]
                fname = None
                files = rec.get("file_names")
                if files and start + seq_len < len(files):
                    fname = files[start + seq_len]
                samples.append((np.stack(crops[:-1]), crops[-1], fname, box))
                if limit and len(samples) >= limit:
                    return samples
    return samples


def _load_image(fname, box, out_hw):
    from PIL import Image

    if fname and os.path.exists(fname):
        img = Image.open(fname).convert("RGB")
        img = img.crop(box).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
        return np.asarray(img, np.float32)
    return np.zeros((*out_hw, 3), np.float32)


def do_train(cfg, resume=False):
    import jax
    import jax.numpy as jnp
    import optax

    from vnext_tpu.checkpoint.checkpointer import Checkpointer
    from vnext_tpu.models.instmove import InstMovePredictor, instmove_loss
    from vnext_tpu.utils.events import (
        CommonMetricPrinter,
        EventStorage,
        JSONWriter,
    )
    from vnext_tpu.utils.logger import setup_logger

    logger = setup_logger(cfg.OUTPUT_DIR)
    seq_len = cfg.MODEL.INSTMOVE.SEQ_LEN
    mask_hw = tuple(cfg.MODEL.INSTMOVE.MASK_SIZE)
    samples = []
    for name in cfg.DATASETS.TRAIN:
        samples += build_mask_sequences(name, seq_len, mask_hw)
    if not samples:
        raise RuntimeError("no mask sequences found in the training datasets")
    logger.info("InstMove: %d mask sequences", len(samples))

    model = InstMovePredictor(
        memory_size=cfg.MODEL.INSTMOVE.MEMORY_SIZE,
        num_lstm_layers=cfg.MODEL.INSTMOVE.LSTM_LAYERS,
        lstm_channels=cfg.MODEL.INSTMOVE.LSTM_CHANNELS,
    )
    b = max(1, cfg.SOLVER.IMS_PER_BATCH)
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN)
    std = np.asarray(cfg.MODEL.PIXEL_STD)

    def make_batch(rng):
        idx = rng.randint(0, len(samples), b)
        past = np.stack([samples[i][0] for i in idx])[..., None]
        nxt = np.stack([samples[i][1] for i in idx])[:, None, ..., None]
        imgs = np.stack(
            [(_load_image(samples[i][2], samples[i][3], mask_hw) - mean) / std
             for i in idx]
        )
        return jnp.asarray(past), jnp.asarray(nxt), jnp.asarray(imgs, jnp.float32)

    rng = np.random.RandomState(max(cfg.SEED, 0))
    past, nxt, imgs = make_batch(rng)
    params = model.init({"params": jax.random.PRNGKey(0)}, past, imgs)["params"]
    tx = optax.adamw(cfg.SOLVER.BASE_LR, weight_decay=cfg.SOLVER.WEIGHT_DECAY)
    opt_state = tx.init(params)
    checkpointer = Checkpointer(cfg.OUTPUT_DIR)

    @jax.jit
    def step(params, opt_state, past, nxt, imgs):
        def loss_fn(p):
            pred = model.apply({"params": p}, past, imgs, out_len=1)
            losses = instmove_loss(pred, nxt)
            return losses["loss_mask"] + losses["loss_dice"], losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, losses

    writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
               JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    with EventStorage(0) as storage:
        for it in range(cfg.SOLVER.MAX_ITER):
            past, nxt, imgs = make_batch(rng)
            params, opt_state, total, losses = step(params, opt_state, past, nxt, imgs)
            storage.put_scalar("total_loss", float(total))
            for k, v in losses.items():
                storage.put_scalar(k, float(v))
            if (it + 1) % 20 == 0 or it + 1 == cfg.SOLVER.MAX_ITER:
                for wtr in writers:
                    wtr.write()
            if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                checkpointer.save(f"instmove_{it + 1:07d}", params)
            storage.step()
    checkpointer.save("instmove_final", params)
    return params


def main():
    from vnext_tpu.config import add_maskformer_config, get_cfg
    from vnext_tpu.data import register_all_ytvis
    from vnext_tpu.data.datasets.synthetic import register_synthetic_ytvis

    args = default_argument_parser().parse_args()
    cfg = get_cfg()
    add_maskformer_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    register_all_ytvis()
    register_synthetic_ytvis()
    do_train(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
