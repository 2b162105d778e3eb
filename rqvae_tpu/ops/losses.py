"""Loss functions for the RQ-VAE stage.

Reference parity: /root/reference/modules/loss.py
- reconstruction_loss             <- ReconstructionLoss (loss.py:5-10)
- categorical_reconstruction_loss <- CategoricalReconstuctionLoss (loss.py:13-30)
- quantize_loss                   <- QuantizeLoss (loss.py:33-41)

All return per-example vectors [B] (summed over feature axis), like the
reference; the trainer takes means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient


def reconstruction_loss(x_hat: jax.Array, x: jax.Array) -> jax.Array:
    """Sum-of-squares reconstruction error over the last axis -> [B]."""
    return jnp.sum((x_hat - x) ** 2, axis=-1)


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross entropy with logits (torch BCEWithLogitsLoss,
    reduction='none'): max(z,0) - z*y + log(1 + exp(-|z|))."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def categorical_reconstruction_loss(x_hat: jax.Array, x: jax.Array, n_cat_feats: int) -> jax.Array:
    """MSE over the dense slice + BCE-with-logits summed over the trailing
    `n_cat_feats` one-hot features. With n_cat_feats == 0 this is plain MSE."""
    if n_cat_feats <= 0:
        return reconstruction_loss(x_hat, x)
    dense = reconstruction_loss(x_hat[..., :-n_cat_feats], x[..., :-n_cat_feats])
    cat = jnp.sum(_bce_with_logits(x_hat[..., -n_cat_feats:], x[..., -n_cat_feats:]), axis=-1)
    return dense + cat


def quantize_loss(query: jax.Array, value: jax.Array, commitment_weight: float = 1.0) -> jax.Array:
    """VQ loss: ||sg(q) - v||^2 + beta * ||q - sg(v)||^2, summed over last axis."""
    emb_loss = jnp.sum((sg(query) - value) ** 2, axis=-1)
    query_loss = jnp.sum((query - sg(value)) ** 2, axis=-1)
    return emb_loss + commitment_weight * query_loss
