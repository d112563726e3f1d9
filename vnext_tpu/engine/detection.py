"""Generic image-detection train/eval driver for the detectron2-core
meta-architectures: GeneralizedRCNN / PanopticFPN / ProposalNetwork /
RetinaNet / FCOS / SemanticSegmentor.

Reference surface: tools/train_net.py (Trainer with per-type build_evaluator,
train_net.py:82) and tools/plain_train_net.py do_train/do_test — the piece
that lets every image meta-arch run end-to-end from a yaml config.

TPU redesign: one jitted SPMD train step per arch (fixed-shape padded targets
from data/detection_mapper.py), a jitted fixed-size inference function, and a
host-side output adapter that rescales the padded detections back to the
original image coordinates for the evaluators.
"""

from __future__ import annotations

import logging
import random
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.build import PrefetchIterator, TrainingSampler
from ..data.catalog import DatasetCatalog
from ..data.detection_mapper import DetectionDatasetMapper, stack_detection_batch
from ..models import build_model
from ..models.retinanet import DetTargets
from .train_step import TrainState

logger = logging.getLogger("vnext_tpu")

# arch capability table: (needs_sizes, needs_masks, needs_sem_seg, needs_rng)
_ARCH = {
    "GeneralizedRCNN": dict(sizes=True, masks=True, sem_seg=False, rng=True),
    "PanopticFPN": dict(sizes=True, masks=True, sem_seg=True, rng=True),
    "ProposalNetwork": dict(sizes=True, masks=False, sem_seg=False, rng=True),
    "RetinaNet": dict(sizes=False, masks=False, sem_seg=False, rng=False),
    "FCOS": dict(sizes=False, masks=False, sem_seg=False, rng=False),
    "SemanticSegmentor": dict(sizes=False, masks=False, sem_seg=True, rng=False),
}


def build_detection_train_loader(
    cfg,
    mapper: Optional[DetectionDatasetMapper] = None,
    dataset_dicts: Optional[List[dict]] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    prefetch: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batched train loader of image samples
    (reference surface: data/build.py:378 build_detection_train_loader)."""
    if dataset_dicts is None:
        dataset_dicts = [d for n in cfg.DATASETS.TRAIN for d in DatasetCatalog.get(n)]
    if mapper is None:
        mapper = DetectionDatasetMapper.from_config(cfg, is_train=True)
    if batch_size is None:
        batch_size = max(cfg.SOLVER.IMS_PER_BATCH // num_shards, 1)
    sampler = TrainingSampler(len(dataset_dicts), seed=seed,
                              shard_index=shard_index, num_shards=num_shards)

    def gen():
        rng = random.Random(seed * 1000 + shard_index)
        batch = []
        for idx in sampler:
            batch.append(mapper(dataset_dicts[idx], rng))
            if len(batch) == batch_size:
                yield stack_detection_batch(batch)
                batch = []

    return PrefetchIterator(gen(), buffer_size=prefetch)


def build_detection_test_loader(cfg, dataset_name: str) -> List[dict]:
    """Per-image records for evaluation (reference build.py:469)."""
    return DatasetCatalog.get(dataset_name)


def make_batch_adapter(cfg, rng_key=None):
    """Collated detection batch -> the configured arch's __call__ args."""
    arch = cfg.MODEL.META_ARCHITECTURE
    spec = _ARCH[arch]
    mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)
    mask_on = spec["masks"] and cfg.MODEL.MASK_ON
    keypoint_on = arch == "GeneralizedRCNN" and cfg.MODEL.KEYPOINT_ON

    def adapter(batch):
        images = (jnp.asarray(batch["image"]).astype(jnp.float32) - mean) / std
        targets = DetTargets(
            labels=jnp.asarray(batch["labels"]),
            boxes=jnp.asarray(batch["boxes"]),
            valid=jnp.asarray(batch["valid"]),
        )
        args = [images]
        kwargs = {}
        if spec["sizes"]:
            args.append(jnp.asarray(batch["size"]))
        if arch == "SemanticSegmentor":
            args.append(jnp.asarray(batch["sem_seg"]))
        else:
            args.append(targets)
        if mask_on and "masks" in batch:
            kwargs["gt_masks"] = jnp.asarray(batch["masks"], jnp.float32)
        if keypoint_on and "keypoints" in batch:
            kwargs["gt_keypoints"] = jnp.asarray(batch["keypoints"], jnp.float32)
        if spec["sem_seg"] and arch != "SemanticSegmentor" and "sem_seg" in batch:
            kwargs["sem_seg_gt"] = jnp.asarray(batch["sem_seg"])
        return tuple(args), kwargs

    return adapter


def make_detection_train_step(cfg, model, tx, donate: bool = True):
    """Jitted SPMD train step for any image meta-arch: loss sum -> grads ->
    optimizer update, the fused analogue of SimpleTrainer.run_step."""
    spec = _ARCH[cfg.MODEL.META_ARCHITECTURE]

    def loss_fn(params, args, kwargs, rng):
        if spec["rng"]:
            kwargs = dict(kwargs, rng_key=rng)
        losses = model.apply({"params": params}, *args, train=True, **kwargs)
        total = sum(losses.values())
        return total, losses

    def train_step(state: TrainState, batch, rng):
        args, kwargs = batch
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, args, kwargs, rng
        )
        import optax

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class DetectionInference:
    """Host-side per-image inference runner: resize -> pad -> jitted forward ->
    rescale outputs to original coordinates (DefaultPredictor analogue for the
    image meta-archs, reference engine/defaults.py:280)."""

    def __init__(self, cfg, model=None, params=None):
        self.cfg = cfg
        self.arch = cfg.MODEL.META_ARCHITECTURE
        self.spec = _ARCH[self.arch]
        self.model = model if model is not None else build_model(cfg)
        self.mapper = DetectionDatasetMapper.from_config(cfg, is_train=False)
        self.mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        th, tw = cfg.TPU.TEST_IMAGE_SIZE
        self.target_size = (th, tw)
        if params is None:
            params = self._init_params()
        self.params = params
        self._infer = jax.jit(self._infer_fn)

    def _init_params(self):
        th, tw = self.target_size
        images = jnp.zeros((1, th, tw, 3), jnp.float32)
        sizes = jnp.asarray([[th, tw]], jnp.int32)
        if self.spec["sizes"]:
            fn = lambda: self.model.init(
                jax.random.PRNGKey(0), images, sizes, method=type(self.model).inference
            )["params"]
        else:
            fn = lambda: self.model.init(
                jax.random.PRNGKey(0), images, method=type(self.model).inference
            )["params"]
        return jax.jit(fn)()

    def _infer_fn(self, params, images, sizes):
        if self.spec["sizes"]:
            return self.model.apply(
                {"params": params}, images, sizes, method=type(self.model).inference
            )
        return self.model.apply(
            {"params": params}, images, method=type(self.model).inference
        )

    def __call__(self, record: dict) -> dict:
        from ..data.dataset_mapper import _load_image

        img = (
            _load_image(record["file_name"])
            if "file_name" in record
            else record["image"]
        )
        oh, ow = record.get("height", img.shape[0]), record.get("width", img.shape[1])
        tfms = self.mapper.aug.build(img.shape[0], img.shape[1], random.Random(0))
        resized = tfms.apply_image(img)
        h, w = resized.shape[:2]
        th, tw = self.target_size
        h, w = min(h, th), min(w, tw)
        padded = np.zeros((th, tw, 3), np.float32)
        padded[:h, :w] = (resized[:h, :w].astype(np.float32) - self.mean) / self.std
        out = self._infer(
            self.params, jnp.asarray(padded)[None], jnp.asarray([[h, w]], jnp.int32)
        )
        out = jax.tree_util.tree_map(np.asarray, out)

        if self.arch == "SemanticSegmentor":
            # out is [1, th/4, tw/4] argmax labels; upsample + crop to original
            sem = out[0] if not isinstance(out, dict) else out["sem_seg"][0]
            sem = sem.repeat(4, axis=0).repeat(4, axis=1)[:h, :w]
            sem = _resize_nearest(sem, (oh, ow))
            return {"sem_seg": sem}

        result = {}
        sx, sy = ow / max(w, 1), oh / max(h, 1)
        if "boxes" in out:
            boxes = out["boxes"][0] * np.asarray([sx, sy, sx, sy], np.float32)
            result.update(
                boxes=boxes,
                scores=out["scores"][0],
                classes=out["classes"][0],
                valid=out["valid"][0],
            )
            if "mask_probs" in out:
                from ..ops.mask_ops import paste_masks_in_image

                result["masks"] = np.asarray(
                    paste_masks_in_image(
                        jnp.asarray(out["mask_probs"][0]), jnp.asarray(boxes), (oh, ow)
                    )
                )
            if "keypoints" in out:
                kps = out["keypoints"][0].copy()
                kps[..., 0] *= sx
                kps[..., 1] *= sy
                result["keypoints"] = kps
        if "proposal_boxes" in out:
            result["proposal_boxes"] = out["proposal_boxes"][0] * np.asarray(
                [sx, sy, sx, sy], np.float32
            )
            result["objectness_logits"] = out["objectness_logits"][0]
        if "sem_seg" in out and self.arch == "PanopticFPN":
            sem = out["sem_seg"][0].repeat(4, axis=0).repeat(4, axis=1)[:h, :w]
            result["sem_seg"] = _resize_nearest(sem, (oh, ow))
        return result


def _resize_nearest(arr: np.ndarray, shape) -> np.ndarray:
    oh, ow = shape
    ys = (np.arange(oh) * arr.shape[0] / oh).astype(np.int64).clip(0, arr.shape[0] - 1)
    xs = (np.arange(ow) * arr.shape[1] / ow).astype(np.int64).clip(0, arr.shape[1] - 1)
    return arr[ys][:, xs]


def do_eval_detection(cfg, params=None) -> Dict[str, dict]:
    """--eval-only driver for the image meta-archs (plain_train_net.py do_test)."""
    from ..checkpoint.checkpointer import load_weights
    from ..evaluation import build_evaluator, verify_results

    model = build_model(cfg)
    runner = DetectionInference(cfg, model, params)
    if params is None and cfg.MODEL.WEIGHTS:
        runner.params = load_weights(cfg.MODEL.WEIGHTS, runner.params)
    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        evaluator = build_evaluator(cfg, dataset_name)
        evaluator.reset()
        for record in build_detection_test_loader(cfg, dataset_name):
            output = runner(record)
            evaluator.process([record], [output])
        results[dataset_name] = evaluator.evaluate()
    if cfg.TEST.EXPECTED_RESULTS and results:
        verify_results(cfg, next(iter(results.values())))
    return results


def do_train_detection(cfg, resume: bool = False):
    """Generic training loop for the image meta-archs (train_net.py do_train)."""
    import os

    from ..checkpoint.checkpointer import Checkpointer
    from ..engine.hooks import (
        EvalHook,
        IterationTimer,
        LRTracker,
        PeriodicCheckpointer,
        PeriodicWriter,
    )
    from ..engine.trainer import VISTrainer
    from ..parallel import build_mesh, replicate
    from ..solver import build_lr_schedule, build_optimizer
    from ..utils.events import CommonMetricPrinter, JSONWriter

    model = build_model(cfg)
    mesh = build_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXIS_NAMES))
    adapter = make_batch_adapter(cfg)

    # init with one mapped sample so every arch sees its real input structure
    loader = build_detection_train_loader(cfg, seed=max(cfg.SEED, 0))
    first = next(iter(loader))
    args, kwargs = adapter(jax.tree_util.tree_map(
        lambda x: x[:1] if isinstance(x, np.ndarray) else x,
        {k: v for k, v in first.items() if k != "image_id"},
    ))
    spec = _ARCH[cfg.MODEL.META_ARCHITECTURE]
    if spec["rng"]:
        kwargs = dict(kwargs, rng_key=jax.random.PRNGKey(1))
    params = model.init(
        jax.random.PRNGKey(cfg.SEED if cfg.SEED > 0 else 0), *args, train=True, **kwargs
    )["params"]

    tx = build_optimizer(cfg, params)
    train_step = make_detection_train_step(cfg, model, tx, donate=cfg.TPU.DONATE_STATE)
    checkpointer = Checkpointer(cfg.OUTPUT_DIR)
    state = TrainState.create(params, tx)
    state, start_iter = checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, state, resume=resume)

    with mesh:
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        trainer = VISTrainer(
            train_step, state, loader, jax.random.PRNGKey(max(cfg.SEED, 0)),
            batch_adapter=adapter,
        )
        trainer.register_hooks(
            [
                IterationTimer(),
                LRTracker(build_lr_schedule(cfg)),
                PeriodicCheckpointer(checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD),
                EvalHook(
                    cfg.TEST.EVAL_PERIOD,
                    lambda: do_eval_detection(cfg, trainer.state.params),
                ),
                PeriodicWriter(
                    [
                        CommonMetricPrinter(cfg.SOLVER.MAX_ITER),
                        JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
                    ]
                ),
            ]
        )
        trainer.train(start_iter, cfg.SOLVER.MAX_ITER)
    from ..evaluation import verify_final_loss

    verify_final_loss(cfg, trainer)
    return trainer
