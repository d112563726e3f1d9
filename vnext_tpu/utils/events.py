"""In-process metric storage and writers.

Reference surface: detectron2/utils/events.py (EventStorage:274, JSONWriter:50,
TensorboardXWriter:131, CommonMetricPrinter:181, get_event_storage:26).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Dict, List, Optional

_CURRENT_STORAGE_STACK: List["EventStorage"] = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() called outside 'with EventStorage(...)'"
    return _CURRENT_STORAGE_STACK[-1]


def has_event_storage() -> bool:
    return len(_CURRENT_STORAGE_STACK) > 0


class HistoryBuffer:
    """Scalar series with a bounded window for median/avg smoothing."""

    def __init__(self, window_size: int = 20):
        self._window = deque(maxlen=window_size)
        self._count = 0
        self._global_avg = 0.0
        self._latest = float("nan")

    def update(self, value: float, iteration: Optional[int] = None) -> None:
        value = float(value)
        self._window.append(value)
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count
        self._latest = value

    def latest(self) -> float:
        return self._latest

    def median(self, window_size: Optional[int] = None) -> float:
        """Median of the last ``window_size`` values (fvcore HistoryBuffer)."""
        vals = list(self._window)
        if window_size is not None:
            vals = vals[-window_size:]
        if not vals:
            return float("nan")
        vals = sorted(vals)
        return vals[len(vals) // 2]

    def avg(self, window_size: Optional[int] = None) -> float:
        vals = list(self._window)
        if window_size is not None:
            vals = vals[-window_size:]
        if not vals:
            return float("nan")
        return sum(vals) / len(vals)

    def global_avg(self) -> float:
        return self._global_avg

    def count(self) -> int:
        return self._count


class EventStorage:
    """Scoped scalar store used by training loops and hooks."""

    def __init__(self, start_iter: int = 0, window_size: int = 20):
        self._history: Dict[str, HistoryBuffer] = defaultdict(lambda: HistoryBuffer(window_size))
        self._smoothing_hints: Dict[str, bool] = {}
        self._latest_scalars: Dict[str, tuple] = {}
        self._iter = start_iter
        self._prefix = ""
        self._vis_data: list = []
        self._histograms: list = []

    def put_image(self, img_name: str, img_tensor) -> None:
        """Queue an RGB image for the TB writer (reference detectron2/utils/events.py:294).

        ``img_tensor``: [3, H, W] uint8 in [0,255] or float in [0,1] (numpy or jax array).
        """
        import numpy as np

        self._vis_data.append((img_name, np.asarray(img_tensor), self._iter))

    def clear_images(self) -> None:
        self._vis_data = []

    def put_histogram(self, hist_name: str, hist_tensor, bins: int = 1000) -> None:
        """Queue a raw histogram for the TB writer (reference detectron2/utils/events.py:347).

        Stores the same raw-summary dict the reference builds with torch.histc, computed
        with numpy so device arrays are pulled to host exactly once.
        """
        import numpy as np

        vals = np.asarray(hist_tensor, dtype=np.float64).reshape(-1)
        ht_min, ht_max = float(vals.min()), float(vals.max())
        hist_counts, hist_edges = np.histogram(vals, bins=bins, range=(ht_min, ht_max))
        self._histograms.append(
            dict(
                tag=hist_name,
                min=ht_min,
                max=ht_max,
                num=int(vals.size),
                sum=float(vals.sum()),
                sum_squares=float(np.sum(vals**2)),
                bucket_limits=hist_edges[1:].tolist(),
                bucket_counts=hist_counts.tolist(),
                global_step=self._iter,
            )
        )

    def clear_histograms(self) -> None:
        self._histograms = []

    @property
    def iter(self) -> int:
        return self._iter

    @iter.setter
    def iter(self, value: int) -> None:
        self._iter = int(value)

    def put_scalar(self, name: str, value: float, smoothing_hint: bool = True) -> None:
        name = self._prefix + name
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest_scalars[name] = (value, self._iter)
        existing = self._smoothing_hints.get(name)
        if existing is not None and existing != smoothing_hint:
            raise ValueError(f"Scalar {name} was put with inconsistent smoothing_hint")
        self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    def history(self, name: str) -> HistoryBuffer:
        if name not in self._history:
            raise KeyError(f"No history metric '{name}'")
        return self._history[name]

    def histories(self) -> Dict[str, HistoryBuffer]:
        return self._history

    def latest(self) -> Dict[str, tuple]:
        return self._latest_scalars

    def latest_with_smoothing_hint(self, window_size: int = 20) -> Dict[str, tuple]:
        result = {}
        for k, (v, itr) in self._latest_scalars.items():
            result[k] = (
                self._history[k].median(window_size) if self._smoothing_hints.get(k) else v,
                itr,
            )
        return result

    def smoothing_hints(self) -> Dict[str, bool]:
        return self._smoothing_hints

    @contextmanager
    def name_scope(self, name: str):
        old = self._prefix
        self._prefix = name.rstrip("/") + "/"
        try:
            yield
        finally:
            self._prefix = old

    def step(self) -> None:
        self._iter += 1

    def __enter__(self) -> "EventStorage":
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, *args) -> None:
        assert _CURRENT_STORAGE_STACK[-1] is self
        _CURRENT_STORAGE_STACK.pop()


class EventWriter:
    def write(self) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class JSONWriter(EventWriter):
    """Append latest scalars to a jsonl file (metrics.json)."""

    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(json_file) or ".", exist_ok=True)
        self._file = open(json_file, "a")
        self._window_size = window_size
        self._last_write = -1

    def write(self) -> None:
        storage = get_event_storage()
        to_save = defaultdict(dict)
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr <= self._last_write:
                continue
            to_save[itr][k] = v
        if to_save:
            self._last_write = max(to_save.keys())
        for itr in sorted(to_save.keys()):
            to_save[itr]["iteration"] = itr
            self._file.write(json.dumps(to_save[itr], sort_keys=True) + "\n")
        self._file.flush()

    def close(self) -> None:
        self._file.close()


class CommonMetricPrinter(EventWriter):
    """Console printer with ETA, losses, lr (reference: events.py:181)."""

    def __init__(self, max_iter: Optional[int] = None, window_size: int = 20):
        self.logger = logging.getLogger("vnext_tpu")
        self._max_iter = max_iter
        self._window_size = window_size
        self._last_write = None

    def write(self) -> None:
        storage = get_event_storage()
        iteration = storage.iter

        eta_string = None
        try:
            iter_time = storage.history("time").global_avg()
            if self._max_iter is not None:
                eta_seconds = iter_time * (self._max_iter - iteration - 1)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
        except KeyError:
            iter_time = None

        try:
            lr = "{:.5g}".format(storage.history("lr").latest())
        except KeyError:
            lr = "N/A"

        losses = [
            "{}: {:.4g}".format(k, v.median(self._window_size))
            for k, v in storage.histories().items()
            if "loss" in k
        ]
        msg = f"iter: {iteration}"
        if eta_string:
            msg = f"eta: {eta_string}  " + msg
        if losses:
            msg += "  " + "  ".join(losses)
        if iter_time is not None:
            msg += f"  time: {iter_time:.4f}"
        msg += f"  lr: {lr}"
        self.logger.info(msg)


class TensorboardWriter(EventWriter):
    """TensorBoard writer; gracefully degrades to a no-op if tensorboard is absent."""

    def __init__(self, log_dir: str, window_size: int = 20):
        self._window_size = window_size
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            logging.getLogger("vnext_tpu").warning(
                "tensorboard unavailable; TensorboardWriter is a no-op"
            )
        self._last_write = -1

    def write(self) -> None:
        if self._writer is None:
            return
        storage = get_event_storage()
        new_last = self._last_write
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr > self._last_write:
                self._writer.add_scalar(k, v, itr)
                new_last = max(new_last, itr)
        self._last_write = new_last
        if storage._vis_data:
            for img_name, img, step_num in storage._vis_data:
                self._writer.add_image(img_name, img, step_num)
            storage.clear_images()
        if storage._histograms:
            for params in storage._histograms:
                self._writer.add_histogram_raw(**params)
            storage.clear_histograms()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
