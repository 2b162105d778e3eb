"""Fused decoder-stack serving kernel (ops/pallas/decoder_stack.py).

The kernel must reproduce the XLA decoder path exactly: same RMSNorm
math, same beam-folded cross-attention, and a beam-folded SELF-attention
whose block-diagonal -1e9 mask underflows to exact zeros through softmax.
Oracle = T5Stack.__call__ (the path tests/test_t5.py locks against HF).
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.models.t5 import T5Stack, T5StackConfig

CFG = T5StackConfig(
    d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout=0.0,
    fused_decode="interpret",
)


def _setup(beams=3, T=2, B=4, Le=6, seed=0, dtype="float32"):
    cfg = replace(CFG, dtype=dtype)
    stack = T5Stack(cfg, is_decoder=True)
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B * beams, T, cfg.d_model).astype(np.float32))
    enc = jnp.asarray(r.randn(B, Le, cfg.d_model).astype(np.float32))
    enc_mask = jnp.asarray((r.rand(B, Le) > 0.2).astype(np.int32))
    enc_mask = enc_mask.at[:, 0].set(1)  # no fully-masked rows
    params = stack.init(jax.random.PRNGKey(seed), x, enc_out=enc, enc_mask=enc_mask, beams=beams)
    return stack, params, x, enc, enc_mask


class TestKernelOracle:
    @pytest.mark.parametrize("beams,T", [(1, 1), (3, 2), (5, 3)])
    def test_matches_xla_stack(self, beams, T):
        stack, params, x, enc, enc_mask = _setup(beams=beams, T=T)
        B = enc.shape[0]
        want = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask, beams=beams)

        kv = stack.apply(params, enc, method=T5Stack.cross_kv)
        got = stack.apply(
            params, x.reshape(B, beams * T, -1), kv, enc_mask, beams,
            interpret=True, method=T5Stack.fused_decode,
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(B * beams, T, -1), np.asarray(want),
            rtol=1e-5, atol=1e-5,
        )

    def test_bf16_close(self):
        stack, params, x, enc, enc_mask = _setup(beams=3, T=2, dtype="bfloat16")
        B = enc.shape[0]
        want = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask, beams=3)
        kv = stack.apply(params, enc, method=T5Stack.cross_kv)
        got = stack.apply(
            params, x.reshape(B, 6, -1), kv, enc_mask, 3,
            interpret=True, method=T5Stack.fused_decode,
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(B * 3, 2, -1), np.asarray(want),
            rtol=0.05, atol=0.05,
        )


class TestGeneratePath:
    def _model(self, fused_decode):
        cfg = RetrievalConfig(
            num_hierarchies=3, codebook_size=8, t5_d_model=32, t5_d_kv=8,
            t5_num_heads=4, t5_d_ff=64, t5_num_layers=2, t5_dropout=0.0,
            top_k_for_generation=5, t5_fused_decode=fused_decode,
        )
        from tests.test_retrieval import _make_batch
        from rqvae_tpu.serving.beam import build_prefix_table

        rng = np.random.RandomState(3)
        batch, corpus = _make_batch(rng)
        model = EncoderDecoderRetrievalModel(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, training=True,
        )
        table = build_prefix_table(jnp.asarray(corpus), 8)
        return model, params, batch, table

    def test_generate_fused_equals_xla(self):
        """The full constrained beam search must be unchanged by the
        fused decode path (f32, interpret mode)."""
        model, params, batch, table = self._model("off")
        out_x = model.apply(
            params, batch.sem_ids, batch.seq_mask, batch.user_ids, table,
            method=EncoderDecoderRetrievalModel.generate,
        )
        model_f, _, _, _ = self._model("interpret")
        out_f = model_f.apply(
            params, batch.sem_ids, batch.seq_mask, batch.user_ids, table,
            method=EncoderDecoderRetrievalModel.generate,
        )
        np.testing.assert_array_equal(np.asarray(out_f.sem_ids), np.asarray(out_x.sem_ids))
        np.testing.assert_allclose(
            np.asarray(out_f.log_probas), np.asarray(out_x.log_probas), rtol=1e-4, atol=1e-5
        )


class TestGate:
    def test_modes(self):
        from rqvae_tpu.models.t5 import FUSED_DECODE_MAX_LEN

        short = FUSED_DECODE_MAX_LEN  # inclusive cap
        mk = lambda mode: T5Stack(replace(CFG, fused_decode=mode), is_decoder=True)
        assert mk("off").use_fused_decode(short) is False
        assert mk("on").use_fused_decode(short) is True
        assert mk("interpret").use_fused_decode(short) == "interpret"
        # auto on CPU (test env) declines (chip gate is TPU + 1 device)
        assert mk("auto").use_fused_decode(short) is False
        # the measured length gate applies to "on" too: the kernel loses
        # (and can OOM scoped vmem) at long encoder rows — r4 chip A/Bs
        assert mk("on").use_fused_decode(short + 1) is False
        assert mk("auto").use_fused_decode(short + 1) is False

    def test_block_b_budget(self):
        from rqvae_tpu.ops.pallas.decoder_stack import _auto_block_b

        # chip-proven fit table (r4 sessions): Le<=128 caps at bb=16 — 32
        # compiled standalone but OOM'd inside the fused Retriever query
        assert _auto_block_b(64, 4, 6, 32, 80, 64, 384, 1024, 2) == 16
        assert _auto_block_b(64, 4, 6, 32, 128, 64, 384, 1024, 2) == 16
        # beyond the fit table's Le<=128 row the cap drops to chip-proven
        # blocks (Le=256 @ bb=16 OOM'd scoped vmem; bb=8 fits)
        assert _auto_block_b(64, 4, 6, 32, 256, 64, 384, 1024, 2) == 8
        assert _auto_block_b(64, 4, 6, 32, 512, 64, 384, 1024, 2) == 8
        # ML-32M long rows: the K/V cache forces smaller blocks
        bb = _auto_block_b(64, 4, 6, 30, 804, 64, 384, 1024, 2)
        assert 1 <= bb <= 4
