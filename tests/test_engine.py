"""Engine/hook/scheduler/events unit tests (reference surface:
detectron2 tests/test_engine.py, test_scheduler.py, test_events.py).

A fake trainer (run_step = put a scalar) drives the hook loop the way the
reference's _SimpleModel-based SimpleTrainer tests do (test_engine.py:22).
"""

import json
import os

import numpy as np
import pytest

from vnext_tpu.engine.trainer import TrainerBase
from vnext_tpu.engine.hooks import (
    BestCheckpointer,
    EvalHook,
    HookBase,
    PeriodicCheckpointer,
    PeriodicWriter,
)
from vnext_tpu.utils.events import EventStorage, JSONWriter, get_event_storage


class _FakeTrainer(TrainerBase):
    def __init__(self, losses=None):
        super().__init__()
        self.losses = losses or {}
        self.state = {"iter": 0}

    def run_step(self):
        self.storage.put_scalar("total_loss", 10.0 - 0.1 * self.iter)
        for k, seq in self.losses.items():
            self.storage.put_scalar(k, seq[self.iter], smoothing_hint=False)

    def checkpoint_state(self):
        return {"iter": self.iter}


class _RecordingHook(HookBase):
    def __init__(self):
        self.calls = []

    def before_train(self):
        self.calls.append(("before_train", self.trainer.iter))

    def before_step(self):
        self.calls.append(("before_step", self.trainer.iter))

    def after_step(self):
        self.calls.append(("after_step", self.trainer.iter))

    def after_train(self):
        self.calls.append(("after_train", self.trainer.iter))


class _FakeCheckpointer:
    def __init__(self):
        self.saved = []

    def save(self, name, state):
        self.saved.append((name, dict(state)))


def test_hook_lifecycle_and_order():
    t = _FakeTrainer()
    h = _RecordingHook()
    t.register_hooks([h, None])
    t.train(0, 4)
    kinds = [c[0] for c in h.calls]
    assert kinds == (["before_train"] + ["before_step", "after_step"] * 4 + ["after_train"])
    # after_train sees iter == max_iter (reference train_loop semantics)
    assert h.calls[-1][1] == 4
    assert [c[1] for c in h.calls if c[0] == "before_step"] == [0, 1, 2, 3]


def test_eval_hook_schedule():
    fired = []
    t = _FakeTrainer()
    t.register_hooks([EvalHook(3, lambda: fired.append(t.iter) or {"m": 1.0})])
    t.train(0, 10)
    # periodic at iters 2, 5, 8 — skipping the final-iter duplicate — plus the
    # final eval in after_train (reference hooks.py:501 EvalHook)
    assert fired == [2, 5, 8, 10]


def test_eval_hook_results_land_in_storage():
    t = _FakeTrainer()
    t.register_hooks([EvalHook(0, lambda: {"seg": {"AP": 0.5}})])
    t.train(0, 2)
    # nested dicts flatten to slash-joined keys, unsmoothed
    assert t.storage.latest()["seg/AP"][0] == 0.5


def test_periodic_checkpointer():
    ck = _FakeCheckpointer()
    t = _FakeTrainer()
    t.register_hooks([PeriodicCheckpointer(ck, period=3)])
    t.train(0, 7)
    # iters 2, 5 periodic + final iter 6
    assert [n for n, _ in ck.saved] == ["model_0000002", "model_0000005", "model_0000006"]
    assert ck.saved[-1][1] == {"iter": 6}


def test_best_checkpointer_saves_on_improvement_only():
    metric = [0.3, 0.5, 0.4, 0.6]
    ck = _FakeCheckpointer()
    t = _FakeTrainer(losses={"val_ap": metric})
    t.register_hooks([BestCheckpointer(1, ck, "val_ap", mode="max")])
    t.train(0, 4)
    assert [s[1]["iter"] for s in ck.saved] == [0, 1, 3]
    assert all(n == "model_best" for n, _ in ck.saved)


class _ListWriter:
    def __init__(self):
        self.writes = 0
        self.closed = False

    def write(self):
        self.writes += 1

    def close(self):
        self.closed = True


def test_periodic_writer():
    w = _ListWriter()
    t = _FakeTrainer()
    t.register_hooks([PeriodicWriter([w], period=4)])
    t.train(0, 10)
    # iters 3, 7 periodic + final iter 9 + once more in after_train
    # (reference PeriodicWriter.after_train flushes before close)
    assert w.writes == 4
    assert w.closed


def test_event_storage_smoothing_and_history():
    with EventStorage(0) as s:
        for i in range(10):
            s.iter = i
            s.put_scalar("loss", float(i), smoothing_hint=True)
            s.put_scalar("lr", float(i), smoothing_hint=False)
        h = s.history("loss")
        assert h.latest() == 9.0
        assert h.median(3) == 8.0
        assert h.avg(4) == np.mean([6, 7, 8, 9])
        assert h.global_avg() == np.mean(range(10))
        smoothed = s.latest_with_smoothing_hint(window_size=4)
        assert smoothed["loss"][0] == h.median(4)
        assert smoothed["lr"][0] == 9.0  # unsmoothed passes through
        assert get_event_storage() is s


def test_event_storage_name_scope():
    with EventStorage(0) as s:
        with s.name_scope("stage1"):
            s.put_scalar("x", 1.0)
        assert "stage1/x" in s.histories()


def test_json_writer(tmp_path):
    path = os.path.join(tmp_path, "metrics.json")
    with EventStorage(0) as s:
        w = JSONWriter(path, window_size=1)
        for i in range(3):
            s.iter = i
            s.put_scalar("loss", float(i))
            w.write()
        w.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3
    assert lines[-1]["loss"] == 2.0
    assert all("iteration" in l for l in lines)


def _sched_cfg(name, **over):
    from vnext_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = name
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.SOLVER.STEPS = (30, 60)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.MAX_ITER = 100
    for k, v in over.items():
        setattr(cfg.SOLVER, k, v)
    return cfg


def test_warmup_multistep_schedule():
    """Reference: tests/test_scheduler.py WarmupMultiStepLR values."""
    from vnext_tpu.solver.build import build_lr_schedule

    sched = build_lr_schedule(_sched_cfg("WarmupMultiStepLR"))
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(float(sched(5)), 0.1 + 0.9 * 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(29)), 1.0)
    np.testing.assert_allclose(float(sched(30)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(60)), 0.01, rtol=1e-6)


def test_warmup_cosine_schedule():
    from vnext_tpu.solver.build import build_lr_schedule

    sched = build_lr_schedule(_sched_cfg("WarmupCosineLR"))
    np.testing.assert_allclose(float(sched(0)), 0.1)
    np.testing.assert_allclose(
        float(sched(50)), 0.5 * (1 + np.cos(np.pi * 0.5)), atol=1e-6)
    assert float(sched(99)) < 0.01


def test_checkpointer_resume_round_trip(tmp_path):
    import flax.struct
    from vnext_tpu.checkpoint.checkpointer import Checkpointer

    @flax.struct.dataclass
    class _State:
        params: dict
        step: int

    ck = Checkpointer(str(tmp_path))
    state = _State(params={"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, step=7)
    ck.save("model_0000007", state)
    assert ck.has_checkpoint()
    assert ck.get_checkpoint_file().endswith("model_0000007")
    template = _State(params={"w": np.zeros((2, 3), np.float32)}, step=0)
    loaded, step = ck.resume_or_load("", template, resume=True)
    np.testing.assert_array_equal(np.asarray(loaded.params["w"]), state.params["w"])
    assert step == 7


def test_event_storage_put_image_and_histogram():
    """reference detectron2/utils/events.py:294 (put_image), :347 (put_histogram)."""
    import numpy as np

    with EventStorage(start_iter=5) as storage:
        img = np.zeros((3, 8, 8), dtype=np.uint8)
        storage.put_image("viz/frame", img)
        assert len(storage._vis_data) == 1
        name, tensor, it = storage._vis_data[0]
        assert name == "viz/frame" and it == 5 and tensor.shape == (3, 8, 8)
        storage.clear_images()
        assert storage._vis_data == []

        vals = np.array([0.0, 1.0, 2.0, 3.0], dtype=np.float32)
        storage.put_histogram("param/w", vals, bins=4)
        (h,) = storage._histograms
        assert h["tag"] == "param/w" and h["min"] == 0.0 and h["max"] == 3.0
        assert h["num"] == 4 and h["sum"] == 6.0 and h["sum_squares"] == 14.0
        assert len(h["bucket_limits"]) == 4 and sum(h["bucket_counts"]) == 4
        assert h["global_step"] == 5
        storage.clear_histograms()
        assert storage._histograms == []
