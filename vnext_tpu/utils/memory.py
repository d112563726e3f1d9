"""OOM fallback helper (reference surface: detectron2/utils/memory.py:26
retry_if_cuda_oom). The TPU analogue retries with progressively smaller static
batch splits — XLA OOMs are allocation-time RuntimeErrors, and the recovery is
to re-run on smaller shards and concatenate."""

from __future__ import annotations

import functools
import logging
from typing import Callable

import numpy as np

logger = logging.getLogger("vnext_tpu")


def _is_oom(e: Exception) -> bool:
    msg = str(e).lower()
    return "resource exhausted" in msg or "out of memory" in msg or "oom" in msg


def retry_if_oom(fn: Callable, max_splits: int = 3) -> Callable:
    """Wrap a batched fn(x, ...) so device OOM retries on halved leading-dim shards."""

    @functools.wraps(fn)
    def wrapped(x, *args, **kwargs):
        try:
            return fn(x, *args, **kwargs)
        except RuntimeError as e:
            if not _is_oom(e):
                raise
        for split in range(1, max_splits + 1):
            parts = 2**split
            n = x.shape[0]
            if parts > n:
                break
            logger.warning("OOM: retrying %s in %d shards", getattr(fn, "__name__", "fn"), parts)
            try:
                chunks = []
                step = (n + parts - 1) // parts
                for i in range(0, n, step):
                    chunks.append(np.asarray(fn(x[i : i + step], *args, **kwargs)))
                return np.concatenate(chunks, axis=0)
            except RuntimeError as e:
                if not _is_oom(e):
                    raise
        raise RuntimeError("retry_if_oom: still OOM after max splits")

    return wrapped
