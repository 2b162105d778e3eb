"""Stage-2 trainer integration smoke test (tiny shapes, CPU)."""

import numpy as np

from rqvae_tpu.data.registry import RecDataset
from rqvae_tpu.models.quantize import QuantizeForwardMode


class TestDecoderTrainer:
    def test_end_to_end_with_rqvae_checkpoint(self, tmp_path):
        from rqvae_tpu.train.train_rqvae import train as train_rqvae
        from rqvae_tpu.train.train_decoder import train as train_decoder

        ds = str(tmp_path / "ds")
        s1 = train_rqvae(
            iterations=20,
            batch_size=32,
            dataset_folder=ds,
            dataset=RecDataset.SYNTHETIC,
            save_dir_root=str(tmp_path / "rq"),
            vae_input_dim=64,
            vae_n_cat_feats=0,
            vae_hidden_dims=[32],
            vae_embed_dim=8,
            vae_codebook_size=16,
            vae_n_layers=3,
            vae_codebook_mode=QuantizeForwardMode.STE,
            eval_every=1000,
            save_model_every=20,
            do_eval=False,
        )
        assert s1["checkpoint_path"]

        s2 = train_decoder(
            iterations=12,
            batch_size=16,
            dataset_folder=ds,
            dataset=RecDataset.SYNTHETIC,
            pretrained_rqvae_path=s1["checkpoint_path"],
            save_dir_root=str(tmp_path / "dec"),
            t5_d_model=32,
            t5_num_heads=4,
            t5_d_ff=64,
            t5_num_layers=1,
            t5_dropout=0.0,
            top_k_for_generation=5,
            partial_eval_every=6,
            full_eval_every=12,
            save_model_every=12,
            warmup_steps=5,
            full_eval_max_batches=2,
            log_every=4,
        )
        assert np.isfinite(s2["total_loss"])
        assert "eval_loss" in s2
        assert "h@5" in s2 and 0.0 <= s2["h@5"] <= 1.0
        assert s2["checkpoint_path"]

        # resume
        s3 = train_decoder(
            iterations=3,
            batch_size=16,
            dataset_folder=ds,
            dataset=RecDataset.SYNTHETIC,
            pretrained_rqvae_path=s1["checkpoint_path"],
            pretrained_decoder_path=s2["checkpoint_path"],
            save_dir_root=str(tmp_path / "dec2"),
            t5_d_model=32,
            t5_num_heads=4,
            t5_d_ff=64,
            t5_num_layers=1,
            t5_dropout=0.1,
            t5_hash_dropout=False,  # exercise the flax nn.Dropout fallback
            top_k_for_generation=5,
            partial_eval_every=1000,
            full_eval_every=1000,
            save_model_every=1000,
            warmup_steps=5,
        )
        assert np.isfinite(s3["total_loss"])
