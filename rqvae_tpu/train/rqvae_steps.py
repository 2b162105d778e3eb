"""Jitted train/eval steps for the RQ-VAE stage.

Replaces the reference hot loop (train_rqvae.py:174-216): forward + backward
+ AdamW update fused into one XLA program with donated state. Gradient
accumulation is a lax.scan over micro-batches. Data parallelism comes from
sharding the batch over the mesh 'data' axis; GSPMD inserts the gradient
all-reduce (the NCCL all-reduce at train_rqvae.py:195 in the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.models.rqvae import RqVae, RqVaeComputedLosses
from rqvae_tpu.train.state import TrainState


def make_rqvae_train_step(model: RqVae, tx: optax.GradientTransformation):
    """Returns train_step(state, x, key, gumbel_t) -> (state, metrics).

    x: [A, B, input_dim] with A = gradient_accumulate_every micro-batches
    (A=1 for no accumulation). Loss is averaged over micro-batches, matching
    the reference's loss/gradient_accumulate_every scaling
    (train_rqvae.py:186-195).
    """

    def loss_fn(params, x_micro, key, gumbel_t):
        out: RqVaeComputedLosses = model.apply(
            params, x_micro, gumbel_t, training=True, rngs={"gumbel": key}
        )
        metrics = {
            "total_loss": out.loss,
            "reconstruction_loss": out.reconstruction_loss,
            "rqvae_loss": out.rqvae_loss,
            "p_unique_ids": out.p_unique_ids,
            "emb_norms": jnp.mean(out.embs_norm, axis=0),  # [L]
        }
        return out.loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x: jax.Array, key: jax.Array, gumbel_t: jax.Array):
        n_micro = x.shape[0]

        def micro(carry, inp):
            grads_acc, metrics_acc = carry
            x_m, k_m = inp
            (_, metrics), grads = grad_fn(state.params, x_m, k_m, gumbel_t)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_metrics = {
            "total_loss": 0.0,
            "reconstruction_loss": 0.0,
            "rqvae_loss": 0.0,
            "p_unique_ids": 0.0,
            "emb_norms": jnp.zeros(model.config.n_layers),
        }
        keys = jax.random.split(key, n_micro)
        (grads, metrics), _ = jax.lax.scan(micro, (zero_grads, zero_metrics), (x, keys))
        grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / n_micro, metrics)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_rqvae_eval_step(model: RqVae):
    """Eval-loss step (reference train_rqvae.py:236-256; eval-mode forward)."""

    @jax.jit
    def eval_step(params, x: jax.Array, gumbel_t: jax.Array) -> Dict[str, jax.Array]:
        out: RqVaeComputedLosses = model.apply(params, x, gumbel_t, training=False)
        return {
            "eval_total_loss": out.loss,
            "eval_reconstruction_loss": out.reconstruction_loss,
            "eval_rqvae_loss": out.rqvae_loss,
        }

    return eval_step
