"""HF-hub-style export/load and Retriever.from_checkpoints tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.registry import RecDataset
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
from rqvae_tpu.utils.hub import load_pretrained, save_pretrained


class TestHub:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = RqVaeConfig(input_dim=32, embed_dim=8, hidden_dims=(16,), codebook_size=8, n_layers=2)
        m = RqVae(cfg)
        x = jnp.ones((4, 32))
        p = m.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x, 0.2, training=True
        )
        d = save_pretrained(str(tmp_path / "export"), p, cfg)
        cfg2, p2 = load_pretrained(d, params_template=p)
        assert cfg2.embed_dim == 8
        a = m.apply(p, x, training=False, method=RqVae.get_semantic_ids).sem_ids
        b = m.apply(p2, x, training=False, method=RqVae.get_semantic_ids).sem_ids
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRetrieverFromCheckpoints:
    def test_two_checkpoint_bootstrap(self, tmp_path):
        from rqvae_tpu.data.datasets import load_processed
        from rqvae_tpu.serving.retriever import Retriever
        from rqvae_tpu.train.train_decoder import train as train_decoder
        from rqvae_tpu.train.train_rqvae import train as train_rqvae

        ds = str(tmp_path / "ds")
        s1 = train_rqvae(
            iterations=10, batch_size=32, dataset_folder=ds, dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "rq"), vae_input_dim=64, vae_n_cat_feats=0,
            vae_hidden_dims=[32], vae_embed_dim=8, vae_codebook_size=16, vae_n_layers=3,
            vae_codebook_mode=QuantizeForwardMode.STE, eval_every=1000, save_model_every=10,
            do_eval=False,
        )
        s2 = train_decoder(
            iterations=5, batch_size=16, dataset_folder=ds, dataset=RecDataset.SYNTHETIC,
            pretrained_rqvae_path=s1["checkpoint_path"], save_dir_root=str(tmp_path / "dec"),
            t5_d_model=32, t5_num_heads=4, t5_d_ff=64, t5_num_layers=1, t5_dropout=0.0,
            top_k_for_generation=5, partial_eval_every=1000, full_eval_every=1000,
            save_model_every=5, warmup_steps=5,
        )
        feats = load_processed(ds)["item_features"]
        r = Retriever.from_checkpoints(s1["checkpoint_path"], s2["checkpoint_path"], feats)
        out = r.retrieve(np.array([[1, 2, 3, -1, -1], [5, 6, -1, -1, -1]]))
        items = np.asarray(out.item_ids)
        assert items.shape == (2, 5)
        logp = np.asarray(out.log_probas)
        assert ((items >= 0) == (logp > -1e8)).all()
