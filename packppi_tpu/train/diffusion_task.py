"""Diffusion training step: pure, jitted, mesh-shardable.

One ``train_step(state, key, batch) -> (state, loss)`` compiled once per
batch shape bucket. Under a (data, model) mesh the batch shards over 'data'
(XLA inserts the gradient all-reduce over ICI) and large kernels shard over
'model'. NaN/inf losses skip the update on-device (the reference skips such
batches in Python; reference: src/models/TorsionalDiffusion.py:173-177) —
there is no OOM-skip because static bucketed shapes cannot OOM at runtime.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from packppi_tpu.data.batch import ProteinBatch
from packppi_tpu.models.torsional_diffusion import TorsionalDiffusion


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray
    key: jnp.ndarray  # PRNG state advances with the step -> exact resume


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-12) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def init_state(model: TorsionalDiffusion, key, batch: ProteinBatch,
               optimizer: optax.GradientTransformation) -> TrainState:
    k_init, k_train = jax.random.split(key)
    params = model.init(k_init, batch)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32),
                      jax.random.key_data(k_train))


def make_train_step(model: TorsionalDiffusion, optimizer: optax.GradientTransformation):
    def train_step(state: TrainState, batch: ProteinBatch):
        key, k_loss = jax.random.split(jax.random.wrap_key_data(state.key))
        loss, grads = jax.value_and_grad(model.loss)(state.params, k_loss, batch)
        ok = jnp.isfinite(loss)
        # skip the whole update when the loss is invalid: params AND
        # opt_state revert below, so the reverted branch may compute
        # non-finite intermediates freely (where() selects the old values
        # element-wise; no NaN leaks through the select)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                              params, state.params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape") else new,
            opt_state, state.opt_state)
        return TrainState(params, opt_state, state.step + 1,
                          jax.random.key_data(key)), loss

    return train_step


def make_ema_update(decay: float):
    """Exponential moving average of params (jit + donate the old buffer).

    Standard diffusion-model practice the reference harness lacks: the
    sampler evaluates a smoothed parameter trajectory instead of the last
    SGD iterate. Kept OUTSIDE TrainState so the train-state checkpoint
    tree (and every existing checkpoint) is unchanged; the EMA tree is
    saved as a ``<ckpt>_ema`` sidecar (see loop.CheckpointManager).
    """
    def ema_update(ema, params):
        return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                            ema, params)
    return ema_update
