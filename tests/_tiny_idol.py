"""Shared tiny-IDOL construction helpers for tests (kept small so CPU compiles fast)."""

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models import IDOL, Targets

H, W, K, NQ = 64, 96, 6, 20


def make_model():
    return IDOL(
        num_classes=5, hidden_dim=32, num_queries=NQ, nheads=4, dim_feedforward=64,
        enc_layers=1, dec_layers=2, max_insts=8, msda_impl="jnp",
    )


def random_targets(rng, empty=False):
    n_valid = 0 if empty else 3
    boxes = np.zeros((1, K, 4), np.float32)
    boxes[0, :, :2] = rng.rand(K, 2) * 0.5 + 0.25
    boxes[0, :, 2:] = rng.rand(K, 2) * 0.2 + 0.1
    masks = np.zeros((1, K, H // 4, W // 4), bool)
    for i in range(n_valid):
        masks[0, i, 2 + i : 8 + i, 3 : 9 + i] = True
    return Targets(
        labels=jnp.asarray(rng.randint(0, 5, (1, K)), jnp.int32),
        boxes=jnp.asarray(boxes),
        masks_s4=jnp.asarray(masks),
        valid=jnp.asarray(np.arange(K)[None] < n_valid),
        inst_id=jnp.asarray(np.arange(K)[None], jnp.int32),
    )
