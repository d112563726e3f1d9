"""Training hooks (reference surface: detectron2/engine/hooks.py — IterationTimer:84,
PeriodicWriter:156, PeriodicCheckpointer:190, BestCheckpointer:209, LRScheduler:306,
EvalHook:501)."""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

from ..utils.events import get_event_storage

logger = logging.getLogger("vnext_tpu")


class HookBase:
    trainer = None  # set by TrainerBase.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class IterationTimer(HookBase):
    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = None
        self._step_start = None

    def before_train(self):
        self._start_time = time.perf_counter()

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        dt = time.perf_counter() - self._step_start
        storage = get_event_storage()
        if self.trainer.iter >= self.trainer.start_iter + self._warmup_iter:
            storage.put_scalar("time", dt, smoothing_hint=True)

    def after_train(self):
        total = time.perf_counter() - self._start_time
        n = max(self.trainer.iter - self.trainer.start_iter, 1)
        logger.info("Total training time: %.1fs (%.4fs / it)", total, total / n)


class LRTracker(HookBase):
    """Log the current learning rate (optax schedules are pure functions of step)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        get_event_storage().put_scalar(
            "lr", float(self._schedule(self.trainer.iter)), smoothing_hint=False
        )


class PeriodicWriter(HookBase):
    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            for w in self._writers:
                w.write()

    def after_train(self):
        for w in self._writers:
            w.write()
            w.close()


class PeriodicCheckpointer(HookBase):
    def __init__(self, checkpointer, period: int):
        self._checkpointer = checkpointer
        self._period = period

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period == 0 or it == self.trainer.max_iter - 1:
            self._checkpointer.save(f"model_{it:07d}", self.trainer.checkpoint_state())


class EvalHook(HookBase):
    def __init__(self, period: int, eval_fn: Callable[[], Optional[dict]]):
        self._period = period
        self._fn = eval_fn

    def _do_eval(self):
        results = self._fn()
        if results:
            storage = get_event_storage()
            for k, v in _flatten(results):
                storage.put_scalar(k, v, smoothing_hint=False)

    def after_step(self):
        if self._period > 0 and (self.trainer.iter + 1) % self._period == 0:
            if self.trainer.iter != self.trainer.max_iter - 1:
                self._do_eval()

    def after_train(self):
        if self.trainer.iter >= self.trainer.max_iter - 1:
            self._do_eval()


class BestCheckpointer(HookBase):
    """Track a validation metric and checkpoint on improvement (reference :209)."""

    def __init__(self, eval_period: int, checkpointer, val_metric: str, mode: str = "max"):
        self._period = eval_period
        self._checkpointer = checkpointer
        self._metric = val_metric
        self._mode = mode
        self._best = None

    def after_step(self):
        if self._period <= 0 or (self.trainer.iter + 1) % self._period != 0:
            return
        storage = get_event_storage()
        latest = storage.latest().get(self._metric)
        if latest is None:
            return
        value = latest[0]
        better = (
            self._best is None
            or (self._mode == "max" and value > self._best)
            or (self._mode == "min" and value < self._best)
        )
        if better:
            self._best = value
            self._checkpointer.save("model_best", self.trainer.checkpoint_state())
            logger.info("New best %s=%.4f at iter %d", self._metric, value, self.trainer.iter)


class ProfilerHook(HookBase):
    """Capture a device trace for a window of steps (reference surface:
    engine/hooks.py:376 TorchProfiler -> jax.profiler)."""

    def __init__(self, output_dir: str, start_iter: int = 10, num_steps: int = 5):
        self._dir = output_dir
        self._start = start_iter
        self._stop = start_iter + num_steps
        self._active = False

    def before_step(self):
        if self.trainer.iter == self._start and not self._active:
            import jax

            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        if self.trainer.iter + 1 >= self._stop and self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info("Profiler trace written to %s", self._dir)

    def after_train(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def _flatten(d, prefix=""):
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key + "/")
        else:
            try:
                yield key, float(v)
            except (TypeError, ValueError):
                pass


def update_bn_stats(apply_stats_fn: Callable, variables: dict, batches,
                    momentum: float = 0.9) -> dict:
    """PreciseBN statistics recomputation (reference: hooks.py:566 PreciseBN /
    fvcore update_bn_stats): run N batches and replace every BatchNorm
    mean/var with the TRUE average of the per-batch statistics.

    ``apply_stats_fn(variables, batch) -> new_batch_stats`` must run the model
    in training mode with ``mutable=["batch_stats"]`` and return the updated
    collection. Since flax BatchNorm writes ``new = m*old + (1-m)*batch``, the
    per-batch statistic is recovered as ``(new - m*old) / (1-m)`` and averaged
    across batches — exact for any momentum, no model surgery needed.
    """
    import jax

    old_stats = variables["batch_stats"]
    sums = jax.tree_util.tree_map(lambda x: x * 0.0, old_stats)
    n = 0
    for batch in batches:
        new_stats = apply_stats_fn(variables, batch)
        per_batch = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            new_stats, old_stats,
        )
        sums = jax.tree_util.tree_map(lambda s, b: s + b, sums, per_batch)
        n += 1
    assert n > 0, "update_bn_stats needs at least one batch"
    return jax.tree_util.tree_map(lambda s: s / n, sums)


class PreciseBNHook(HookBase):
    """Every ``period`` steps (and after training), swap the trainer state's
    batch_stats for precisely re-estimated ones over ``num_iters`` loader
    batches."""

    def __init__(self, apply_stats_fn: Callable, data_loader, num_iters: int = 200,
                 period: int = 0, momentum: float = 0.9):
        self._apply = apply_stats_fn
        self._loader = data_loader
        self._num_iters = num_iters
        self._period = period
        self._momentum = momentum

    def _recompute(self):
        import itertools

        state = self.trainer.state
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        new_stats = update_bn_stats(
            self._apply, variables, itertools.islice(iter(self._loader), self._num_iters),
            momentum=self._momentum,
        )
        self.trainer.state = state.replace(batch_stats=new_stats)
        logger.info("PreciseBN: refreshed batch statistics over %d batches", self._num_iters)

    def after_step(self):
        if self._period and (self.trainer.iter + 1) % self._period == 0:
            self._recompute()

    def after_train(self):
        if getattr(self.trainer.state, "batch_stats", None) is not None:
            self._recompute()
