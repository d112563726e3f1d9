"""Data loader construction.

Capability parity with detectron2/data/build.py:378,469
(build_detection_train_loader / build_detection_test_loader) and the clip-aware
variants in projects/IDOL/idol/data/build.py:140,206 — reimagined for a
single-controller JAX host: an infinite shuffled sampler feeds the mapper, batches
are stacked into fixed-shape numpy arrays, and a background thread keeps a small
prefetch queue full while the previous step runs on device.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .catalog import DatasetCatalog
from .dataset_mapper import YTVISDatasetMapper


class TrainingSampler:
    """Infinite stream of dataset indices, shuffled per epoch with a shared seed
    and sharded across processes (reference: samplers/distributed_sampler.py:15)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = seed
        self._shard = shard_index
        self._num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self._seed)
        while True:
            order = g.permutation(self._size) if self._shuffle else np.arange(self._size)
            yield from order[self._shard :: self._num_shards].tolist()


class RepeatFactorTrainingSampler:
    """Category-frequency rebalancing sampler (reference:
    samplers/distributed_sampler.py:129, used for LVIS): each image repeats by
    r(I) = max_{c in I} max(1, sqrt(t / f(c))), with the fractional part applied
    stochastically per epoch."""

    def __init__(self, dataset_dicts: List[dict], repeat_thresh: float, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1):
        from collections import Counter

        counts: Counter = Counter()
        n = len(dataset_dicts)
        for rec in dataset_dicts:
            annos = rec.get("annotations", [])
            if annos and isinstance(annos[0], list):  # video records: flatten frames
                cats = {o["category_id"] for frame in annos for o in frame}
            else:
                cats = {o["category_id"] for o in annos}
            counts.update(cats)
        freqs = {c: counts[c] / n for c in counts}
        self._repeat_factors = np.asarray(
            [
                max(
                    [1.0]
                    + [
                        max(1.0, np.sqrt(repeat_thresh / freqs[c]))
                        for c in (
                            {o["category_id"] for frame in rec.get("annotations", []) for o in frame}
                            if rec.get("annotations") and isinstance(rec["annotations"][0], list)
                            else {o["category_id"] for o in rec.get("annotations", [])}
                        )
                    ]
                )
                for rec in dataset_dicts
            ]
        )
        self._seed = seed
        self._shard = shard_index
        self._num_shards = num_shards

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self._seed)
        int_part = np.floor(self._repeat_factors).astype(np.int64)
        frac = self._repeat_factors - int_part
        epoch = 0
        while True:
            rounds = int_part + (g.rand(len(frac)) < frac)
            indices = np.repeat(np.arange(len(rounds)), rounds)
            order = g.permutation(len(indices))
            yield from indices[order][self._shard :: self._num_shards].tolist()
            epoch += 1


class InferenceSampler:
    """One pass over the dataset, sharded (reference: distributed_sampler.py:245)."""

    def __init__(self, size: int, shard_index: int = 0, num_shards: int = 1):
        self._indices = list(range(size))[shard_index::num_shards]

    def __iter__(self):
        return iter(self._indices)

    def __len__(self):
        return len(self._indices)


class AspectRatioGroupedDataset:
    """Two-bucket (portrait/landscape) batch grouping (reference:
    data/common.py:207 AspectRatioGroupedDataset): consecutive samples of the
    same orientation are batched together so per-batch padding is minimal.

    Wraps an iterator of mapper outputs carrying "height"/"width" (or a
    ``key_fn``); yields lists of ``batch_size`` same-bucket samples."""

    def __init__(self, it: Iterator, batch_size: int, key_fn=None):
        self._it = it
        self._batch_size = batch_size
        self._key_fn = key_fn or (lambda s: int(s["width"] > s["height"]))

    def __iter__(self):
        buckets: List[List] = [[], []]
        for sample in self._it:
            b = buckets[self._key_fn(sample)]
            b.append(sample)
            if len(b) == self._batch_size:
                yield b[:]
                b.clear()


def _stack_clip_batch(samples: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    """Collate mapper outputs into batched fixed-shape arrays."""
    def stack(path_fn):
        return np.stack([path_fn(s) for s in samples])

    out = {}
    for frame in ("key", "ref"):
        out[f"{frame}_image"] = stack(lambda s: s[frame]["image"])
        out[f"{frame}_size"] = stack(lambda s: s[frame]["size"])
        for field in ("labels", "boxes", "masks_s4", "valid", "inst_id"):
            out[f"{frame}_{field}"] = stack(lambda s: s[frame][field])
    return out


class PrefetchIterator:
    """Wrap an iterator with a daemon-thread prefetch queue (double buffering the
    host pipeline against device compute)."""

    def __init__(self, it: Iterator, buffer_size: int = 2):
        self._it = it
        self._queue: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._done = object()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for item in self._it:
                self._queue.put(item)
        finally:
            self._queue.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            raise StopIteration
        return item


def build_vis_train_loader(
    cfg=None,
    dataset_name: Optional[str] = None,
    mapper: Optional[YTVISDatasetMapper] = None,
    dataset_dicts: Optional[List[dict]] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
    prefetch: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batched train loader of clip samples."""
    if dataset_dicts is None:
        names = [dataset_name] if dataset_name else list(cfg.DATASETS.TRAIN)
        dataset_dicts = [d for n in names for d in DatasetCatalog.get(n)]
    if mapper is None:
        mapper = YTVISDatasetMapper.from_config(cfg, is_train=True)
    if batch_size is None:
        batch_size = cfg.SOLVER.IMS_PER_BATCH // num_shards
    sampler = TrainingSampler(len(dataset_dicts), seed=seed,
                              shard_index=shard_index, num_shards=num_shards)

    def gen():
        rng = random.Random(seed * 1000 + shard_index)
        batch = []
        for idx in sampler:
            batch.append(mapper(dataset_dicts[idx], rng))
            if len(batch) == batch_size:
                yield _stack_clip_batch(batch)
                batch = []

    return PrefetchIterator(gen(), buffer_size=prefetch)


def build_vis_test_loader(
    cfg=None,
    dataset_name: Optional[str] = None,
    dataset_dicts: Optional[List[dict]] = None,
    shard_index: int = 0,
    num_shards: int = 1,
):
    """One video record at a time (batch=1 video), like the reference's test loader."""
    if dataset_dicts is None:
        dataset_dicts = DatasetCatalog.get(dataset_name or cfg.DATASETS.TEST[0])
    sampler = InferenceSampler(len(dataset_dicts), shard_index, num_shards)
    for idx in sampler:
        yield dataset_dicts[idx]
