"""Jitted train/eval/generate steps for the retrieval (decoder) stage.

Replaces the reference hot loop (train_decoder.py:175-207): tokenize ->
forward -> backward -> clip -> AdamW -> inv-sqrt LR, fused into one XLA
program with donated state. The LR schedule lives inside the optax chain
(reference steps the torch scheduler after each optimizer step,
train_decoder.py:205).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, GenerationOutput
from rqvae_tpu.serving.beam import PrefixTable
from rqvae_tpu.train.state import TrainState


def make_decoder_train_step(model: EncoderDecoderRetrievalModel, tx: optax.GradientTransformation):
    def loss_fn(params, batch: TokenizedSeqBatch, key):
        out = model.apply(params, batch, training=True, rngs={"dropout": key})
        return out.loss, {"total_loss": out.loss, "loss_d": out.loss_d}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: TokenizedSeqBatch, key: jax.Array):
        (_, metrics), grads = grad_fn(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_decoder_eval_step(model: EncoderDecoderRetrievalModel):
    @jax.jit
    def eval_step(params, batch: TokenizedSeqBatch):
        out = model.apply(params, batch, training=False)
        return {"eval_loss": out.loss, "eval_loss_d": out.loss_d}

    return eval_step


def make_generate_fn(model: EncoderDecoderRetrievalModel):
    """Returns generate(params, batch, prefix_table, rng=None) ->
    GenerationOutput, jitted (reference model.py:393-410)."""

    @jax.jit
    def generate(params, batch: TokenizedSeqBatch, prefix_table: PrefixTable, rng=None):
        return model.apply(
            params,
            batch.sem_ids,
            batch.seq_mask,
            batch.user_ids,
            prefix_table,
            rng,
            method=EncoderDecoderRetrievalModel.generate,
        )

    return generate
