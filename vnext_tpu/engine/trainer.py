"""Hook-driven training loop (reference surface: detectron2/engine/train_loop.py:19
TrainerBase/SimpleTrainer and defaults.py:376 DefaultTrainer).

The TPU redesign: ``run_step`` launches one fused jitted SPMD step
(engine/train_step.py) — loss, grads, clipping, optimizer update all inside XLA —
and the python loop only moves host batches and bookkeeping. NaN guarding follows
the reference's FloatingPointError convention (train_loop.py:337)."""

from __future__ import annotations

import logging
import os
import weakref
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.criterion import Targets
from ..utils.events import EventStorage, get_event_storage
from .hooks import HookBase
from .train_step import TrainState

logger = logging.getLogger("vnext_tpu")


class TrainerBase:
    def __init__(self):
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks: Iterable[Optional[HookBase]]) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int) -> None:
        logger.info("Starting training from iteration %d", start_iter)
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.storage.iter = self.iter
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.iter += 1
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        if self.storage is not None:
            self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError


def batch_to_model_inputs(batch: Dict[str, np.ndarray], pixel_mean, pixel_std):
    """Collated loader batch -> IDOL.__call__ argument tuple (device arrays)."""

    def targets(prefix):
        return Targets(
            labels=jnp.asarray(batch[f"{prefix}_labels"]),
            boxes=jnp.asarray(batch[f"{prefix}_boxes"]),
            masks_s4=jnp.asarray(batch[f"{prefix}_masks_s4"]),
            valid=jnp.asarray(batch[f"{prefix}_valid"]),
            inst_id=jnp.asarray(batch[f"{prefix}_inst_id"]),
        )

    def norm(img):
        x = jnp.asarray(img).astype(jnp.float32)
        return (x - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)

    return (
        norm(batch["key_image"]),
        jnp.asarray(batch["key_size"]),
        norm(batch["ref_image"]),
        jnp.asarray(batch["ref_size"]),
        targets("key"),
        targets("ref"),
    )


class VISTrainer(TrainerBase):
    """SimpleTrainer equivalent: data -> jitted step -> metrics."""

    def __init__(
        self,
        train_step_fn,
        state: TrainState,
        data_iter,
        rng,
        pixel_mean=(123.675, 116.28, 103.53),
        pixel_std=(58.395, 57.12, 57.375),
        batch_adapter=None,
    ):
        super().__init__()
        self._train_step = train_step_fn
        self.state = state
        self._data_iter = iter(data_iter)
        self._rng = rng
        self._pixel_mean = pixel_mean
        self._pixel_std = pixel_std
        # batch_adapter(batch) -> model-input tuple; default is the VIS/IDOL
        # clip format. Image meta-archs pass their own (engine/detection.py).
        self._batch_adapter = batch_adapter
        self._pending_metrics = None

    def run_step(self):
        batch = next(self._data_iter)
        if self._batch_adapter is not None:
            inputs = self._batch_adapter(batch)
        else:
            inputs = batch_to_model_inputs(batch, self._pixel_mean, self._pixel_std)
        self.state, metrics = self._train_step(self.state, inputs, self._rng)
        # write the *previous* step's metrics (keeps the device queue full)
        if self._pending_metrics is not None:
            self._write_metrics(self._pending_metrics)
        self._pending_metrics = metrics

    def _write_metrics(self, metrics):
        host = {k: float(v) for k, v in metrics.items()}
        total = host.get("total_loss", 0.0)
        if not np.isfinite(total):
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={self.iter}: {host}"
            )
        storage = get_event_storage()
        for k, v in host.items():
            storage.put_scalar(k, v, smoothing_hint=True)

    def after_train(self):
        if self._pending_metrics is not None:
            try:
                self._write_metrics(self._pending_metrics)
            except FloatingPointError:
                pass
            self._pending_metrics = None
        super().after_train()

    def checkpoint_state(self):
        return self.state
