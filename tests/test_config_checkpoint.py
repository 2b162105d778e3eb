"""Config parser and checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.data.registry import RecDataset
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from rqvae_tpu.utils.config import apply_config, parse_config_file


class TestConfigParser:
    def test_parse_reference_style_file(self, tmp_path):
        p = tmp_path / "cfg.gin"
        p.write_text(
            """
import data.processed
import modules.quantize

# a comment
train.iterations=400000
train.learning_rate=0.001
train.vae_hidden_dims=[512, 256, 128]
train.dataset=%data.registry.RecDataset.AMAZON
train.vae_codebook_mode=%modules.quantize.QuantizeForwardMode.STE
train.dataset_split="beauty"
train.do_eval=True
"""
        )
        cfg = parse_config_file(str(p))
        assert cfg["iterations"] == 400000
        assert cfg["learning_rate"] == 0.001
        assert cfg["vae_hidden_dims"] == [512, 256, 128]
        assert cfg["dataset"] is RecDataset.AMAZON
        assert cfg["vae_codebook_mode"] is QuantizeForwardMode.STE
        assert cfg["dataset_split"] == "beauty"
        assert cfg["do_eval"] is True

    def test_unknown_scope_raises(self, tmp_path):
        p = tmp_path / "bad.gin"
        p.write_text("evaluate.iterations=1\n")
        with pytest.raises(ValueError, match="unknown scope"):
            parse_config_file(str(p))

    def test_apply_config_rejects_unknown_param(self, tmp_path):
        p = tmp_path / "cfg.gin"
        p.write_text("train.not_a_param=3\n")

        def train(iterations=1):
            return iterations

        with pytest.raises(ValueError, match="not_a_param"):
            apply_config(train, str(p))

    def test_apply_config_calls_with_overrides(self, tmp_path):
        p = tmp_path / "cfg.gin"
        p.write_text("train.iterations=7\n")

        def train(iterations=1, batch_size=2):
            return iterations, batch_size

        assert apply_config(train, str(p), batch_size=5) == (7, 5)


class TestCheckpoint:
    def test_roundtrip_with_template(self, tmp_path):
        from rqvae_tpu.models.rqvae import RqVaeConfig
        from rqvae_tpu.train.state import TrainState, adamw

        params = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
        tx = adamw(1e-3)
        state = TrainState.create(params, tx)
        cfg = RqVaeConfig(input_dim=4, codebook_mode=QuantizeForwardMode.ROTATION_TRICK)

        path = save_checkpoint(str(tmp_path), 42, state.params, state.opt_state, cfg)
        restored = load_checkpoint(path, params_template=params, opt_state_template=state.opt_state)
        assert restored["step"] == 42
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["params"]["w"]), np.arange(6.0).reshape(2, 3)
        )
        rc = restored["config"]
        assert rc.input_dim == 4
        assert rc.codebook_mode is QuantizeForwardMode.ROTATION_TRICK
        assert isinstance(rc.hidden_dims, tuple)

    def test_config_readable_without_template(self, tmp_path):
        from rqvae_tpu.models.rqvae import RqVaeConfig

        params = {"params": {"w": jnp.ones((2, 2))}}
        path = save_checkpoint(str(tmp_path), 7, params, None, RqVaeConfig(embed_dim=12))
        restored = load_checkpoint(path)
        assert restored["step"] == 7
        assert restored["config"].embed_dim == 12

    def test_latest_checkpoint(self, tmp_path):
        params = {"w": jnp.ones(2)}
        save_checkpoint(str(tmp_path), 10, params)
        save_checkpoint(str(tmp_path), 200, params)
        save_checkpoint(str(tmp_path), 30, params)
        assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_200.msgpack")
        assert latest_checkpoint(str(tmp_path / "nope")) is None


class TestTrainerSmoke:
    def test_rqvae_trainer_end_to_end(self, tmp_path):
        from rqvae_tpu.train.train_rqvae import train

        summary = train(
            iterations=30,
            batch_size=32,
            learning_rate=1e-3,
            dataset_folder=str(tmp_path / "ds"),
            dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out"),
            vae_input_dim=64,
            vae_n_cat_feats=0,
            vae_hidden_dims=[32, 16],
            vae_embed_dim=8,
            vae_codebook_size=16,
            vae_n_layers=3,
            vae_codebook_mode=QuantizeForwardMode.STE,
            eval_every=30,
            save_model_every=30,
            log_every=10,
        )
        assert np.isfinite(summary["total_loss"])
        assert "eval_total_loss" in summary
        assert "rqvae_entropy" in summary
        assert summary["checkpoint_path"] is not None

        # resume from the checkpoint
        summary2 = train(
            iterations=5,
            batch_size=32,
            dataset_folder=str(tmp_path / "ds"),
            dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "out2"),
            pretrained_rqvae_path=summary["checkpoint_path"],
            vae_input_dim=64,
            vae_n_cat_feats=0,
            vae_hidden_dims=[32, 16],
            vae_embed_dim=8,
            vae_codebook_size=16,
            vae_n_layers=3,
            vae_codebook_mode=QuantizeForwardMode.STE,
            eval_every=1000,
            save_model_every=1000,
            do_eval=False,
        )
        assert np.isfinite(summary2["total_loss"])
