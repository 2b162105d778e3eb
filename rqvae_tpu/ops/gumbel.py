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
