"""Optimizer and LR schedule builders on optax.

Capability parity with detectron2/solver/build.py:78,114,253 (build_optimizer,
build_lr_scheduler, gradient clipping) and the IDOL trainer's AdamW recipe
(projects/IDOL/train_net.py:93-140: AdamW, backbone LR multiplier 0.1, full-model
gradient clipping). Per-parameter LR overrides become optax masks over the pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def _path_contains(path, *substrings) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    return any(s in joined for s in substrings)


def frozen_mask(params) -> Any:
    """True for parameters that must NOT be trained.

    Frozen set (mirrors the reference): FrozenBatchNorm tensors everywhere
    (backbone.py:27) and the backbone stem + layer1 (BackboneBase freezes all but
    layer2/3/4, idol/models/backbone.py:70-72).
    """

    def is_frozen(path, _):
        if _path_contains(path, "bn1", "bn2", "bn3", "downsample_bn", "running_"):
            if _path_contains(path, "backbone"):
                return True
        if _path_contains(path, "backbone"):
            # stem + layer1 frozen
            if _path_contains(path, "conv1") and not _path_contains(path, "layer"):
                return True
            if _path_contains(path, "layer1_"):
                return True
        return False

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def backbone_mask(params) -> Any:
    """True for trainable backbone parameters (get the LR multiplier)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_contains(path, "backbone"), params
    )


def build_lr_schedule(cfg) -> optax.Schedule:
    """Warmup + multi-step (or cosine) decay (reference: solver/lr_scheduler.py:17)."""
    base_lr = cfg.SOLVER.BASE_LR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    name = cfg.SOLVER.LR_SCHEDULER_NAME

    if name == "WarmupCosineLR":
        def schedule(step):
            warm = warmup_factor + (1 - warmup_factor) * jnp.minimum(step / max(warmup_iters, 1), 1.0)
            progress = jnp.clip(step / max(cfg.SOLVER.MAX_ITER, 1), 0.0, 1.0)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
            return base_lr * jnp.where(step < warmup_iters, warm, cos)
    else:  # WarmupMultiStepLR
        steps = jnp.asarray(sorted(cfg.SOLVER.STEPS), dtype=jnp.int32)
        gamma = cfg.SOLVER.GAMMA

        def schedule(step):
            warm = warmup_factor + (1 - warmup_factor) * jnp.minimum(step / max(warmup_iters, 1), 1.0)
            num_decays = jnp.sum(step >= steps)
            factor = gamma**num_decays
            return base_lr * jnp.where(step < warmup_iters, warm, 1.0) * factor

    return schedule


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """AdamW/SGD with backbone multiplier, frozen-param zeroing and optional clipping."""
    schedule = build_lr_schedule(cfg)
    wd = cfg.SOLVER.WEIGHT_DECAY
    mult = cfg.SOLVER.BACKBONE_MULTIPLIER

    def make_opt(lr_scale: float):
        scaled = lambda step: schedule(step) * lr_scale
        if cfg.SOLVER.OPTIMIZER.upper() == "ADAMW":
            return optax.adamw(scaled, b1=0.9, b2=0.999, weight_decay=wd)
        return optax.sgd(scaled, momentum=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV)

    bb_mask = backbone_mask(params)
    fz_mask = frozen_mask(params)

    def label(path, _):
        if _path_contains(path, "backbone"):
            return "backbone"
        return "main"

    labels = jax.tree_util.tree_map_with_path(label, params)
    tx = optax.multi_transform(
        {"backbone": make_opt(mult), "main": make_opt(1.0)}, labels
    )

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE in ("full_model", "norm"):
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    chain.append(tx)
    # zero updates for frozen parameters (FrozenBN stats, stem, layer1)
    chain.append(
        optax.masked(optax.set_to_zero(), fz_mask)
    )
    return optax.chain(*chain)
