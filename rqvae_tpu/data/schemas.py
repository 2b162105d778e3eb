"""Batch schemas, pytree-compatible NamedTuples of arrays.

Reference parity: /root/reference/data/schemas.py (SeqBatch,
TokenizedSeqBatch, FUT_SUFFIX). Fields hold jnp/np arrays with static
shapes; -1 marks padding everywhere (reference data/processed.py:137-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax

FUT_SUFFIX = "_fut"


class SeqBatch(NamedTuple):
    user_ids: jax.Array  # [B]
    ids: jax.Array  # [B, N] item ids, -1 padded
    ids_fut: jax.Array  # [B] or [B, 1] future (target) item id
    x: jax.Array  # [B, N, D] item features (-1 rows at padding)
    x_fut: jax.Array  # [B, D]
    seq_mask: jax.Array  # [B, N] bool


class TokenizedSeqBatch(NamedTuple):
    user_ids: jax.Array  # [B]
    sem_ids: jax.Array  # [B, N * sem_ids_dim] flattened semantic ids, -1 padded
    sem_ids_fut: jax.Array  # [B, sem_ids_dim]
    seq_mask: jax.Array  # [B, N * sem_ids_dim] bool
    token_type_ids: jax.Array  # [B, N * sem_ids_dim] position-within-tuple ids
    token_type_ids_fut: jax.Array  # [B, sem_ids_dim]
