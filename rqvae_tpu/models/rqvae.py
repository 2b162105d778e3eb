"""RQ-VAE: MLP encoder -> L-level residual quantization -> MLP decoder.

Reference parity: /root/reference/modules/rqvae.py
- residual loop                       (rqvae.py:125-132)
- decode of summed codeword embs      (rqvae.py:146)
- l2norm of the non-categorical slice (rqvae.py:147-150; note with
  n_cat_feats == 0 the reference's `x_hat[..., :-0]` slice is EMPTY, so no
  normalization is applied at all — we reproduce that behavior)
- loss = recon + quantize, mean       (rqvae.py:152-154)
- debug stats embs_norm, p_unique_ids (rqvae.py:156-167; p_unique is
  #distinct tuples / B, computed here via sorted keys instead of the O(B^2)
  pairwise compare)
- per-level codebook_normalize only applies at level 0 (rqvae.py:66)

TPU-first design: the model is a flax.linen module whose forward is pure;
the L-level loop is unrolled (L is small and static) so XLA fuses the whole
encode -> quantize^L -> decode chain into one program. K-means codebook init
is an explicit functional initializer (`kmeans_init_codebooks`) rather than
first-forward mutation (reference quantize.py:107-108).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rqvae_tpu.models.mlp import MLP
from rqvae_tpu.models.quantize import (
    QuantizeDistance,
    QuantizeForwardMode,
    quantize_forward,
)
from rqvae_tpu.ops.dedup import pack_sem_id_tuples
from rqvae_tpu.ops.losses import categorical_reconstruction_loss
from rqvae_tpu.ops.normalize import l2norm
from rqvae_tpu.ops.kmeans import kmeans


@dataclass(frozen=True)
class RqVaeConfig:
    """Hyperparameters; mirrors RqVae.__init__ kwargs (rqvae.py:38-51)."""

    input_dim: int = 768
    embed_dim: int = 32
    hidden_dims: Tuple[int, ...] = (512, 256, 128)
    codebook_size: int = 256
    n_layers: int = 3
    commitment_weight: float = 0.25
    n_cat_feats: int = 0
    codebook_normalize: bool = False
    sim_vq: bool = False
    codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    codebook_distance: QuantizeDistance = QuantizeDistance.L2


class RqVaeOutput(NamedTuple):
    embeddings: jax.Array  # [B, L, D]
    residuals: jax.Array  # [B, L, D]
    sem_ids: jax.Array  # [B, L] int32
    quantize_loss: jax.Array  # [B]


class RqVaeComputedLosses(NamedTuple):
    loss: jax.Array  # scalar
    reconstruction_loss: jax.Array  # scalar (mean)
    rqvae_loss: jax.Array  # scalar (mean)
    embs_norm: jax.Array  # [B, L] per-level embedding norms
    p_unique_ids: jax.Array  # scalar: #distinct tuples / B


class RqVae(nn.Module):
    config: RqVaeConfig

    def setup(self):
        cfg = self.config
        self.encoder = MLP(
            hidden_dims=cfg.hidden_dims,
            out_dim=cfg.embed_dim,
            normalize=cfg.codebook_normalize,
            name="encoder",
        )
        self.decoder = MLP(
            hidden_dims=tuple(reversed(cfg.hidden_dims)),
            out_dim=cfg.input_dim,
            normalize=False,
            name="decoder",
        )
        # Stacked codebooks [L, K, D]; torch nn.init.uniform_ default is
        # U(0, 1) (reference quantize.py:94-97).
        self.codebooks = self.param(
            "codebooks",
            lambda key, shape: jax.random.uniform(key, shape),
            (cfg.n_layers, cfg.codebook_size, cfg.embed_dim),
        )
        if cfg.sim_vq:
            # SimVQ (arXiv:2411.02038): frozen-codebook out-projection,
            # one [D, D] linear per level (reference quantize.py:75-78);
            # per-level torch Linear bound 1/sqrt(D), not 1/sqrt(L*D)
            from rqvae_tpu.models.mlp import stacked_torch_linear_init

            self.out_proj = self.param(
                "out_proj",
                stacked_torch_linear_init,
                (cfg.n_layers, cfg.embed_dim, cfg.embed_dim),
            )

    def effective_codebook(self, level: int) -> jax.Array:
        """out_proj(embedding.weight) for a level (reference quantize.py:110).

        L2 codebook normalization applies only at level 0
        (reference rqvae.py:66: `codebook_normalize=i == 0 and ...`)."""
        cfg = self.config
        cb = self.codebooks[level]
        if cfg.sim_vq:
            cb = cb @ self.out_proj[level]
        if cfg.codebook_normalize and level == 0:
            cb = l2norm(cb)
        return cb

    def encode(self, x: jax.Array, *, training: bool = False) -> jax.Array:
        return self.encoder(x, training=training)

    def decode(self, z: jax.Array, *, training: bool = False) -> jax.Array:
        return self.decoder(z, training=training)

    def get_semantic_ids(
        self,
        x: jax.Array,
        gumbel_t: float = 0.001,
        *,
        training: bool = False,
    ) -> RqVaeOutput:
        """Encode and residually quantize; reference rqvae.py:118-139."""
        cfg = self.config
        res = self.encode(x, training=training)

        needs_key = training and cfg.codebook_mode == QuantizeForwardMode.GUMBEL_SOFTMAX
        key = self.make_rng("gumbel") if needs_key else None

        embs, residuals, sem_ids = [], [], []
        q_loss = jnp.zeros(x.shape[0], dtype=res.dtype)
        for level in range(cfg.n_layers):
            residuals.append(res)
            out = quantize_forward(
                res,
                self.effective_codebook(level),
                mode=cfg.codebook_mode,
                distance=cfg.codebook_distance,
                commitment_weight=cfg.commitment_weight,
                training=training,
                temperature=gumbel_t,
                key=jax.random.fold_in(key, level) if key is not None else None,
            )
            q_loss = q_loss + out.loss
            res = res - out.embeddings
            embs.append(out.embeddings)
            sem_ids.append(out.ids)

        return RqVaeOutput(
            embeddings=jnp.stack(embs, axis=1),
            residuals=jnp.stack(residuals, axis=1),
            sem_ids=jnp.stack(sem_ids, axis=1),
            quantize_loss=q_loss,
        )

    def __call__(
        self, x: jax.Array, gumbel_t: float, *, training: bool = False
    ) -> RqVaeComputedLosses:
        """Full training forward; reference rqvae.py:141-175."""
        cfg = self.config
        quantized = self.get_semantic_ids(x, gumbel_t, training=training)
        x_hat = self.decode(jnp.sum(quantized.embeddings, axis=1), training=training)
        if cfg.n_cat_feats > 0:
            x_hat = jnp.concatenate(
                [
                    l2norm(x_hat[..., : -cfg.n_cat_feats]),
                    x_hat[..., -cfg.n_cat_feats :],
                ],
                axis=-1,
            )
        # else: reference's `[..., :-0]` slice is empty -> x_hat untouched.

        recon = categorical_reconstruction_loss(x_hat, x, cfg.n_cat_feats)
        loss = jnp.mean(recon + quantized.quantize_loss)

        embs_norm = jnp.linalg.norm(quantized.embeddings, axis=-1)  # [B, L]
        keys = pack_sem_id_tuples(jax.lax.stop_gradient(quantized.sem_ids), cfg.codebook_size)
        n_distinct = jnp.sum(
            jnp.concatenate([jnp.ones(1, bool), jnp.diff(jnp.sort(keys)) != 0])
        )
        p_unique = n_distinct / keys.shape[0]

        return RqVaeComputedLosses(
            loss=loss,
            reconstruction_loss=jnp.mean(recon),
            rqvae_loss=jnp.mean(quantized.quantize_loss),
            embs_norm=embs_norm,
            p_unique_ids=p_unique,
        )


def restart_dead_codebook_entries(
    key: jax.Array,
    model: RqVae,
    params,
    x_sample: jax.Array,
    min_usage: int = 1,
) -> Tuple[dict, jax.Array]:
    """Re-seed codebook entries that no sample uses from random residuals.

    A quality extension beyond the reference (which lets dead codes stay
    dead forever — STE/rotation gradients only reach selected codes,
    quantize.py:131-153): codes whose usage over `x_sample` is below
    `min_usage` are replaced by random residual vectors at that level,
    which revives them for subsequent argmin assignment.

    Returns (new_params, dead_counts [L]).
    """
    cfg = model.config
    out = model.apply(params, x_sample, training=False, method=RqVae.get_semantic_ids)
    codebooks = params["params"]["codebooks"]
    new_levels, dead_counts = [], []
    for level in range(cfg.n_layers):
        ids = out.sem_ids[:, level]
        usage = jnp.bincount(ids, length=cfg.codebook_size)
        dead = usage < min_usage  # [K]
        res = out.residuals[:, level]  # [B, D] quantizer inputs at this level
        rk = jax.random.fold_in(key, level)
        seed_idx = jax.random.randint(rk, (cfg.codebook_size,), 0, res.shape[0])
        reseed = res[seed_idx]
        new_levels.append(jnp.where(dead[:, None], reseed, codebooks[level]))
        dead_counts.append(jnp.sum(dead))

    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"]["codebooks"] = jnp.stack(new_levels).astype(codebooks.dtype)
    return new_params, jnp.stack(dead_counts)


def kmeans_init_codebooks(
    key: jax.Array,
    model: RqVae,
    params,
    x_sample: jax.Array,
    max_iters: int = 100,
    gumbel_temperature: Optional[float] = None,
) -> dict:
    """Explicit K-means warm start of all codebook levels.

    Replaces the reference's lazy first-forward mutation (quantize.py:96-108,
    triggered on a <=20k-item batch at train_rqvae.py:178-183). Each level is
    initialized from the residuals produced by hard (eval-path) quantization
    of the previous levels. This matches the reference's training-forward
    residuals EXACTLY for STE (training value == hard lookup) and to
    numerical noise (~1e-6 normalization epsilons) for ROTATION_TRICK — the
    rotation transform maps x onto the selected embedding in value and only
    reroutes the gradient (tests/test_quantize_variants.py::
    TestRotationKmeansInitParity). For GUMBEL_SOFTMAX the reference's
    training value is a SOFT codebook mixture, so its l>0 init residuals
    differ from hard residuals at high temperature: pass
    `gumbel_temperature` (the scheduler's t at iteration 0, reference
    train_rqvae.py:163,178) to reproduce that regime — residuals then
    subtract the gumbel-softmax mixture exactly as the reference's
    mid-forward init sees them (stochastic parity; the gumbel draws come
    from `key`, not torch's RNG).

    Returns a new params pytree with `codebooks` replaced.
    """
    from rqvae_tpu.ops.gumbel import gumbel_softmax_sample

    cfg = model.config

    res = model.apply(params, x_sample, training=False, method=RqVae.encode)
    codebooks = []
    for level in range(cfg.n_layers):
        out = kmeans(jax.random.fold_in(key, level), res, k=cfg.codebook_size, max_iters=max_iters)
        centroids = out.centroids
        codebooks.append(centroids)
        if gumbel_temperature is not None and cfg.codebook_mode == QuantizeForwardMode.GUMBEL_SOFTMAX:
            # reference regime: the next level sees x - soft_mixture
            from rqvae_tpu.models.quantize import codebook_distances

            dist = codebook_distances(res, centroids, cfg.codebook_distance)
            gkey = jax.random.fold_in(jax.random.fold_in(key, 7919), level)
            weights = gumbel_softmax_sample(gkey, -dist, gumbel_temperature)
            emb = weights @ centroids
        else:
            # Hard-assign with the effective codebook the model would use.
            # For the common configs (no sim_vq) effective == raw centroids.
            emb = centroids[out.assignment]
        res = res - emb

    new_cb = jnp.stack(codebooks, axis=0).astype(params["params"]["codebooks"].dtype)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"]["codebooks"] = new_cb
    return new_params
