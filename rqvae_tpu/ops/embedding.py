"""Embedding lookup with a matmul-based backward pass.

The default JAX gradient of `table[ids]` is a scatter-add, which XLA on TPU
lowers to a slow sort-based scatter; for the retrieval model (51k token
positions per step into a tiny [L*K, d] table) the scatter dominates the
train step and makes it precision-independent (bf16 barely helps). The
custom VJP here computes `grad_table = one_hot(ids)^T @ g` — a dense MXU
matmul, exact-equivalent to the scatter-add (float addition order differs
only in association, accumulated in f32).

Use for SMALL vocabularies (the one-hot is [positions, vocab]); large
vocabularies should keep the scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table [V, D], ids int[...]-shaped -> [..., D]."""
    return table[ids]


def _fwd(table, ids):
    # zero-size carrier keeps vocab size + dtype in the residuals without
    # holding data (custom_vjp residuals must be JAX types)
    carrier = jnp.zeros((table.shape[0], 0), table.dtype)
    return table[ids], (ids, carrier)


def _bwd(res, g):
    ids, carrier = res
    vocab = carrier.shape[0]
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    # match the incoming gradient's precision: bf16 grads take the fast
    # bf16 MXU path; f32 grads (f32 mode, or f32 bias tensors under bf16
    # compute) stay f32 so this remains a true scatter-add equivalent
    dt = jnp.bfloat16 if g.dtype == jnp.bfloat16 else jnp.float32
    onehot = jax.nn.one_hot(flat_ids, vocab, dtype=dt)
    grad_table = jnp.einsum(
        "nv,nd->vd", onehot, flat_g.astype(dt), preferred_element_type=jnp.float32
    ).astype(carrier.dtype)
    return grad_table, None


embedding_lookup.defvjp(_fwd, _bwd)
