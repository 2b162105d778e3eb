"""Quantize variant coverage: SimVQ out-projection, level-0 codebook
normalization, cosine distance training, gumbel-mode training."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.quantize import QuantizeDistance, QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
from rqvae_tpu.train.rqvae_steps import make_rqvae_train_step
from rqvae_tpu.train.state import TrainState, adamw


def _train(cfg, steps=80, batch=48, seed=0):
    model = RqVae(cfg)
    x = jnp.asarray(np.random.RandomState(seed).randn(batch, cfg.input_dim).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "gumbel": jax.random.PRNGKey(seed + 1)},
        x,
        0.2,
        training=True,
    )
    tx = adamw(1e-3)
    state = TrainState.create(params, tx)
    step = make_rqvae_train_step(model, tx)
    first = None
    for i in range(steps):
        state, m = step(state, x[None], jax.random.PRNGKey(i), jnp.float32(0.2))
        if first is None:
            first = float(m["reconstruction_loss"])
    return model, state, first, float(m["reconstruction_loss"])


BASE = dict(input_dim=24, embed_dim=8, hidden_dims=(16,), codebook_size=16, n_layers=2, n_cat_feats=0)


class TestSimVQ:
    def test_simvq_params_exist_and_train(self):
        cfg = RqVaeConfig(**BASE, sim_vq=True, codebook_mode=QuantizeForwardMode.STE)
        model, state, first, last = _train(cfg)
        assert "out_proj" in state.params["params"]
        assert state.params["params"]["out_proj"].shape == (2, 8, 8)
        assert np.isfinite(last) and last < first

    def test_effective_codebook_uses_projection(self):
        cfg = RqVaeConfig(**BASE, sim_vq=True, codebook_mode=QuantizeForwardMode.STE)
        model = RqVae(cfg)
        x = jnp.ones((4, 24))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, 0.2, training=True
        )
        raw = np.asarray(params["params"]["codebooks"][0])
        proj = np.asarray(params["params"]["out_proj"][0])
        eff = np.asarray(
            model.apply(params, 0, method=RqVae.effective_codebook)
        )
        np.testing.assert_allclose(eff, raw @ proj, atol=1e-5)


class TestCodebookNormalize:
    def test_level0_normalized_only(self):
        # reference rqvae.py:66: normalize applies to level 0 only
        cfg = RqVaeConfig(**BASE, codebook_normalize=True, codebook_mode=QuantizeForwardMode.STE)
        model = RqVae(cfg)
        x = jnp.ones((4, 24))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, 0.2, training=True
        )
        eff0 = np.asarray(model.apply(params, 0, method=RqVae.effective_codebook))
        eff1 = np.asarray(model.apply(params, 1, method=RqVae.effective_codebook))
        np.testing.assert_allclose(np.linalg.norm(eff0, axis=1), 1.0, atol=1e-5)
        assert not np.allclose(np.linalg.norm(eff1, axis=1), 1.0, atol=1e-3)

    def test_encoder_output_normalized(self):
        cfg = RqVaeConfig(**BASE, codebook_normalize=True, codebook_mode=QuantizeForwardMode.STE)
        model = RqVae(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(6, 24).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, 0.2, training=True
        )
        enc = np.asarray(model.apply(params, x, training=False, method=RqVae.encode))
        np.testing.assert_allclose(np.linalg.norm(enc, axis=1), 1.0, atol=1e-5)


class TestCosineDistance:
    def test_cosine_training_decreases_loss(self):
        cfg = RqVaeConfig(
            **BASE,
            codebook_mode=QuantizeForwardMode.STE,
            codebook_distance=QuantizeDistance.COSINE,
        )
        model, state, first, last = _train(cfg, steps=120)
        assert np.isfinite(last) and last < first

    def test_cosine_ids_are_max_cosine_sim(self):
        cfg = RqVaeConfig(
            **BASE,
            codebook_mode=QuantizeForwardMode.STE,
            codebook_distance=QuantizeDistance.COSINE,
        )
        model = RqVae(cfg)
        x = jnp.asarray(np.random.RandomState(1).randn(10, 24).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, 0.2, training=True
        )
        out = model.apply(params, x, training=False, method=RqVae.get_semantic_ids)
        enc = np.asarray(model.apply(params, x, training=False, method=RqVae.encode))
        cb = np.asarray(model.apply(params, 0, method=RqVae.effective_codebook))
        sims = (enc / np.linalg.norm(enc, axis=1, keepdims=True)) @ (
            cb / np.linalg.norm(cb, axis=1, keepdims=True)
        ).T
        np.testing.assert_array_equal(np.asarray(out.sem_ids[:, 0]), sims.argmax(1))


class TestGumbelTraining:
    def test_gumbel_mode_trains(self):
        cfg = RqVaeConfig(**BASE, codebook_mode=QuantizeForwardMode.GUMBEL_SOFTMAX)
        model, state, first, last = _train(cfg, steps=120)
        assert np.isfinite(last) and last < first
