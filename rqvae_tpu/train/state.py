"""Minimal functional train state (params + optax optimizer state + step).

Replaces the reference's torch AdamW + Accelerate wrapping
(train_rqvae.py:136-153): state is an explicit pytree threaded through
jitted steps with buffer donation.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def adamw(
    learning_rate,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    """torch.optim.AdamW-equivalent (decoupled weight decay scaled by LR),
    with optional global-norm clipping (reference train_decoder.py:202-203)."""
    tx = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
