"""Dead-codebook restart tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import (
    RqVae,
    RqVaeConfig,
    restart_dead_codebook_entries,
)

CFG = RqVaeConfig(
    input_dim=16,
    embed_dim=8,
    hidden_dims=(16,),
    codebook_size=32,
    n_layers=2,
    n_cat_feats=0,
    codebook_mode=QuantizeForwardMode.STE,
)


class TestCodebookRestart:
    def _setup(self):
        model = RqVae(CFG)
        x = jnp.asarray(np.random.RandomState(0).randn(128, 16).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x,
            0.2,
            training=True,
        )
        # force dead codes: move most codebook rows far away from the data
        cbs = np.asarray(params["params"]["codebooks"]).copy()
        cbs[:, 4:, :] = 1000.0
        params["params"]["codebooks"] = jnp.asarray(cbs)
        return model, params, x

    def test_restart_revives_dead_codes(self):
        model, params, x = self._setup()
        out0 = model.apply(params, x, training=False, method=RqVae.get_semantic_ids)
        usage0 = np.array(
            [len(np.unique(np.asarray(out0.sem_ids[:, l]))) for l in range(2)]
        )
        assert (usage0 <= 4).all()  # only the close rows get used

        new_params, dead = restart_dead_codebook_entries(
            jax.random.PRNGKey(2), model, params, x
        )
        assert (np.asarray(dead) >= 28).all()

        out1 = model.apply(new_params, x, training=False, method=RqVae.get_semantic_ids)
        usage1 = np.array(
            [len(np.unique(np.asarray(out1.sem_ids[:, l]))) for l in range(2)]
        )
        assert (usage1 > usage0).all(), f"{usage0} -> {usage1}"
        # quantize loss should drop (codes now live on the data)
        assert float(out1.quantize_loss.mean()) < float(out0.quantize_loss.mean())

    def test_used_codes_untouched(self):
        model, params, x = self._setup()
        out0 = model.apply(params, x, training=False, method=RqVae.get_semantic_ids)
        used0 = np.unique(np.asarray(out0.sem_ids[:, 0]))
        new_params, _ = restart_dead_codebook_entries(jax.random.PRNGKey(3), model, params, x)
        old_cb = np.asarray(params["params"]["codebooks"])
        new_cb = np.asarray(new_params["params"]["codebooks"])
        np.testing.assert_array_equal(new_cb[0, used0], old_cb[0, used0])
