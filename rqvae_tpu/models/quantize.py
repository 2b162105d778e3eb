"""One residual-quantization level: distances, argmin, and the three
training-time gradient estimators.

Reference parity: /root/reference/modules/quantize.py
- QuantizeForwardMode / QuantizeDistance enums     (quantize.py:16-26)
- L2 / cosine distance matrices                    (quantize.py:112-126)
- Gumbel-softmax convex combination                (quantize.py:131-136)
- Straight-through estimator                       (quantize.py:137-139)
- Rotation trick (arXiv:2410.06424 section 4.2),
  incl. the detached norm rescaling                (quantize.py:34-50, 140-153)
- Eval path = hard codebook lookup                 (quantize.py:159-161)
- Commitment loss both ways                        (modules/loss.py:33-41)

This is a pure function over a codebook array so the residual loop in
rqvae.py stays a single fused XLA computation; the codebook parameter and
the optional SimVQ out-projection live in the RqVae module.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rqvae_tpu.ops.gumbel import gumbel_softmax_sample
from rqvae_tpu.ops.losses import quantize_loss
from rqvae_tpu.ops.normalize import l2norm

sg = jax.lax.stop_gradient


class QuantizeForwardMode(enum.Enum):
    GUMBEL_SOFTMAX = 1
    STE = 2
    ROTATION_TRICK = 3


class QuantizeDistance(enum.Enum):
    L2 = 1
    COSINE = 2


class QuantizeOutput(NamedTuple):
    embeddings: jax.Array  # [B, D] estimator output (feeds the decoder / next residual)
    ids: jax.Array  # [B] int32 codeword indices
    loss: jax.Array  # [B] VQ loss


def codebook_distances(x: jax.Array, codebook: jax.Array, distance: QuantizeDistance) -> jax.Array:
    """[B, K] distance matrix between queries and codewords (MXU matmul)."""
    if distance == QuantizeDistance.L2:
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        c2 = jnp.sum(codebook * codebook, axis=-1)
        return x2 + c2[None, :] - 2.0 * (x @ codebook.T)
    if distance == QuantizeDistance.COSINE:
        xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        cn = codebook.T / jnp.linalg.norm(codebook.T, axis=0, keepdims=True)
        return -(xn @ cn)
    raise ValueError(f"Unsupported distance: {distance}")


def efficient_rotation_trick_transform(u: jax.Array, q: jax.Array, e: jax.Array) -> jax.Array:
    """Section 4.2 of arXiv:2410.06424 (reference quantize.py:34-50).

    u, q: unit-ish vectors [B, D]; e: the vector to rotate [B, D]. The
    Householder-style reflection pair is treated as a constant (detached),
    so gradients flow through `e` as if multiplied by a fixed rotation.
    """
    w = sg(l2norm(u + q, eps=1e-6))
    e_dot_w = jnp.sum(e * w, axis=-1, keepdims=True)
    e_dot_u = jnp.sum(e * sg(u), axis=-1, keepdims=True)
    return e - 2.0 * e_dot_w * w + 2.0 * e_dot_u * sg(q)


def quantize_forward(
    x: jax.Array,
    codebook: jax.Array,
    *,
    mode: QuantizeForwardMode,
    distance: QuantizeDistance = QuantizeDistance.L2,
    commitment_weight: float = 0.25,
    training: bool = False,
    temperature: float = 0.001,
    key: Optional[jax.Array] = None,
) -> QuantizeOutput:
    """Quantize `x` [B, D] against `codebook` [K, D].

    `codebook` is the *effective* codebook, i.e. already passed through any
    SimVQ out-projection / L2 normalization (reference applies out_proj to
    embedding.weight before computing distances, quantize.py:110).
    """
    dist = codebook_distances(x, codebook, distance)
    ids = jnp.argmin(sg(dist), axis=-1).astype(jnp.int32)

    if training:
        if mode == QuantizeForwardMode.GUMBEL_SOFTMAX:
            if key is None:
                raise ValueError("GUMBEL_SOFTMAX mode requires an rng key when training")
            weights = gumbel_softmax_sample(key, -dist, temperature)
            emb = weights @ codebook
            emb_out = emb
        elif mode == QuantizeForwardMode.STE:
            emb = codebook[ids]
            emb_out = x + sg(emb - x)
        elif mode == QuantizeForwardMode.ROTATION_TRICK:
            emb = codebook[ids]
            emb_out = efficient_rotation_trick_transform(
                x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8),
                emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8),
                x,
            )
            scale = jnp.linalg.norm(emb, axis=-1, keepdims=True) / (
                jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6
            )
            emb_out = emb_out * sg(scale)
        else:
            raise ValueError(f"Unsupported forward mode: {mode}")
        loss = quantize_loss(query=x, value=emb, commitment_weight=commitment_weight)
    else:
        emb_out = codebook[ids]
        loss = quantize_loss(query=x, value=emb_out, commitment_weight=commitment_weight)

    return QuantizeOutput(embeddings=emb_out, ids=ids, loss=loss)
