"""Environment helpers (reference surface: detectron2/utils/env.py seed_all_rng,
collect_env.py collect_env_info)."""

from __future__ import annotations

import datetime
import os
import random
import sys
from typing import Optional

import numpy as np


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs; returns the seed (jax uses explicit PRNG keys).

    The reference derives a seed from time+pid when none is given
    (env.py:seed_all_rng); we keep that behavior.
    """
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        ) % (2**31)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def collect_env_info() -> str:
    """Version/platform dump for logs and bug reports."""
    lines = [
        f"python: {sys.version.replace(chr(10), ' ')}",
        f"platform: {sys.platform}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        lines.append(f"jax backend: {jax.default_backend()}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    for mod in ("flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            lines.append(f"{mod}: {m.__version__}")
        except Exception:
            lines.append(f"{mod}: unavailable")
    import vnext_tpu

    lines.append(f"vnext_tpu: {vnext_tpu.__version__}")
    return "\n".join(lines)
