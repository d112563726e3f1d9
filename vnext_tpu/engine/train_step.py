"""Jitted SPMD train step.

Replaces the reference's SimpleTrainer.run_step / AMPTrainer
(detectron2/engine/train_loop.py:258,346): one fused XLA program computes the loss
dict, weighted total, gradients, clip, and optimizer update. Under a data mesh the
batch is sharded and parameters replicated; XLA inserts the gradient allreduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    weight_dict: Mapping[str, float],
    donate: bool = True,
) -> Callable:
    """Build the jitted train step.

    The returned function has signature
    ``(state, batch, rng) -> (state, metrics)`` where ``batch`` is the tuple of
    model inputs ``(key_images, key_sizes, ref_images, ref_sizes, det_targets,
    ref_targets)`` with the leading batch dim (shardable over the data axis).
    """

    def loss_fn(params, batch, rng):
        losses = model.apply(
            {"params": params}, *batch, train=True, rngs={"dropout": rng}
        )
        total = sum(
            losses[k] * weight_dict.get(k, 1.0) for k in losses if k in weight_dict
        )
        return total, losses

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
