"""Keyed Gumbel sampling and Gumbel-softmax.

Reference parity: /root/reference/distributions/gumbel.py:8-20. The torch
version draws from a global RNG; here sampling is explicit-key functional JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_gumbel(key: jax.Array, shape, dtype=jnp.float32, eps: float = 1e-20):
    """Sample from Gumbel(0, 1): -log(-log(U + eps) + eps), U ~ Uniform[0, 1)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax_sample(key: jax.Array, logits: jax.Array, temperature) -> jax.Array:
    """Draw a soft sample from the Gumbel-Softmax distribution over the last axis.

    Matches reference semantics (gumbel.py:14-20): softmax((logits + g) / t).
    """
    g = sample_gumbel(key, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def sample_without_replacement(key: jax.Array, logp: jax.Array, n: int) -> jax.Array:
    """Sample n distinct indices from softmax(logp) over the last axis,
    WITHOUT replacement, in fixed shape.

    Gumbel top-k trick (Kool et al. 2019, arXiv:1903.06059): the indices of
    the n largest logp + Gumbel(0,1) perturbations are an exact sample
    without replacement — the TPU-native equivalent of the reference's
    torch.multinomial(probas, n_cands) (default replacement=False,
    /root/reference/modules/model.py:345). Returns int32 [..., n], ordered
    by draw (first index has the unconditional softmax(logp) marginal).
    """
    g = sample_gumbel(key, logp.shape, dtype=logp.dtype)
    _, idx = jax.lax.top_k(logp + g, n)
    return idx
