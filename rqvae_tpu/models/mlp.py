"""Bias-free MLP encoder/decoder.

Reference parity: /root/reference/modules/encoder.py — Linear(bias=False) +
ReLU stack, optional dropout between hidden layers, optional final L2
normalization; the decoder is the same module with reversed hidden dims
(rqvae.py:86-91).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rqvae_tpu.ops.normalize import l2norm

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) ->
# variance 1/(3 fan_in).
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def stacked_torch_linear_init(key, shape, dtype=None):
    """torch nn.Linear init for a STACK of independent linears
    [..., fan_in, fan_out]: bound 1/sqrt(shape[-2]). (Plain
    variance_scaling on a 3-D shape folds the stack dim into fan_in,
    drawing weights sqrt(stack) too small vs torch's per-layer Linear.)"""
    import jax

    bound = 1.0 / (shape[-2] ** 0.5)
    return jax.random.uniform(
        key, shape, dtype or jnp.float32, minval=-bound, maxval=bound
    )


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    dropout: float = 0.0
    normalize: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        dims = list(self.hidden_dims) + [self.out_dim]
        for i, d in enumerate(dims):
            x = nn.Dense(d, use_bias=False, kernel_init=torch_linear_init, name=f"dense_{i}")(x)
            if i != len(dims) - 1:
                x = nn.relu(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=not training)(x)
        if self.normalize:
            x = l2norm(x)
        return x
