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


class TestFromPretrained:
    """Hub pull-by-repo-id parity (reference PyTorchModelHubMixin,
    modules/rqvae.py:37; published mirror README.md:15). Local-directory
    loads for every supported layout + the offline repo-id degradation."""

    def _cfg_and_model(self):
        cfg = RqVaeConfig(
            input_dim=24, embed_dim=8, hidden_dims=(16, 12), codebook_size=16,
            n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE,
        )
        return cfg, RqVae(cfg)

    def test_native_dir(self, tmp_path):
        from rqvae_tpu.utils.hub import from_pretrained

        cfg, m = self._cfg_and_model()
        x = jnp.ones((4, cfg.input_dim))
        p = m.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x, 0.2, training=True,
        )
        d = save_pretrained(str(tmp_path / "native"), p, cfg)
        cfg2, p2 = from_pretrained(d)
        assert cfg2 == cfg
        a = m.apply(p, x, training=False, method=RqVae.get_semantic_ids).sem_ids
        b = m.apply(p2, x, training=False, method=RqVae.get_semantic_ids).sem_ids
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mixin_safetensors_dir(self, tmp_path):
        """The layout the published reference mirror has: config.json with
        the RqVae init kwargs + model.safetensors."""
        import json

        from safetensors.numpy import save_file
        from tests.test_torch_import import _reference_layout_state_dict, _torch_forward_ids

        from rqvae_tpu.utils.hub import from_pretrained

        cfg, m = self._cfg_and_model()
        sd = _reference_layout_state_dict(cfg)
        d = tmp_path / "mirror"
        d.mkdir()
        save_file({k: v.numpy() for k, v in sd.items()}, str(d / "model.safetensors"))
        (d / "config.json").write_text(json.dumps({
            "input_dim": cfg.input_dim, "embed_dim": cfg.embed_dim,
            "hidden_dims": list(cfg.hidden_dims), "codebook_size": cfg.codebook_size,
            "n_layers": cfg.n_layers, "commitment_weight": 0.25,
            "n_cat_features": 0, "codebook_normalize": False,
            "codebook_sim_vq": False, "codebook_mode": "QuantizeForwardMode.STE",
        }))
        cfg2, params = from_pretrained(str(d))
        assert cfg2.codebook_mode == QuantizeForwardMode.STE
        assert cfg2.hidden_dims == cfg.hidden_dims
        params = jax.tree_util.tree_map(jnp.asarray, params)
        x = np.random.RandomState(0).randn(16, cfg.input_dim).astype(np.float32)
        ours = np.asarray(
            m.apply(params, jnp.asarray(x), training=False, method=RqVae.get_semantic_ids).sem_ids
        )
        ref = _torch_forward_ids(sd, cfg, x)
        assert (ours == ref).all(1).mean() >= 0.999

    def test_raw_pt_dir(self, tmp_path):
        import pytest

        torch = pytest.importorskip("torch")
        from tests.test_torch_import import _reference_layout_state_dict

        from rqvae_tpu.utils.hub import from_pretrained

        cfg, m = self._cfg_and_model()
        sd = _reference_layout_state_dict(cfg)
        d = tmp_path / "ckpts"
        d.mkdir()
        torch.save(
            {"iter": 7, "model": sd, "model_config": {
                "input_dim": cfg.input_dim, "embed_dim": cfg.embed_dim,
                "hidden_dims": list(cfg.hidden_dims),
                "codebook_size": cfg.codebook_size, "n_layers": cfg.n_layers,
                "n_cat_features": 0,
            }},
            str(d / "checkpoint_7.pt"),
        )
        cfg2, params = from_pretrained(str(d))
        assert cfg2.input_dim == cfg.input_dim
        assert params["params"]["codebooks"].shape == (3, 16, 8)

    def test_repo_id_offline_error(self, monkeypatch):
        import pytest

        from rqvae_tpu.utils.hub import from_pretrained

        monkeypatch.setenv("HF_HUB_OFFLINE", "1")
        with pytest.raises(RuntimeError, match="downloading"):
            from_pretrained("edobotta/rqvae-amazon-beauty")

    def test_empty_dir_error(self, tmp_path):
        import pytest

        from rqvae_tpu.utils.hub import from_pretrained

        with pytest.raises(FileNotFoundError, match="no loadable model"):
            from_pretrained(str(tmp_path))
