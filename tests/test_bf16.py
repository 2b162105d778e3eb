"""bf16 compute-dtype tests: params stay f32, outputs close to f32 path."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.models.t5 import T5Stack, T5StackConfig


class TestBf16:
    def test_stack_bf16_close_to_f32(self):
        cfg32 = T5StackConfig(d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout=0.0)
        cfg16 = T5StackConfig(
            d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout=0.0, dtype="bfloat16"
        )
        x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 32).astype(np.float32))
        s32, s16 = T5Stack(cfg32), T5Stack(cfg16)
        p = s32.init(jax.random.PRNGKey(0), x)
        # params are f32 in both cases and interchangeable
        out32 = np.asarray(s32.apply(p, x))
        out16 = np.asarray(s16.apply(p, x))
        assert out16.dtype == np.float32  # cast back at stack output
        rel = np.abs(out32 - out16).max() / (np.abs(out32).max() + 1e-9)
        assert rel < 0.05, f"bf16 deviation {rel}"
        for leaf in jax.tree_util.tree_leaves(p):
            assert leaf.dtype == jnp.float32

    def test_retrieval_bf16_loss_close(self):
        from tests.test_retrieval import CFG, _init_model

        model32, params, batch, _ = _init_model()
        cfg16 = RetrievalConfig(**{**CFG.__dict__, "t5_dtype": "bfloat16"})
        model16 = EncoderDecoderRetrievalModel(cfg16)
        l32 = float(model32.apply(params, batch, training=False).loss)
        l16 = float(model16.apply(params, batch, training=False).loss)
        assert abs(l32 - l16) / abs(l32) < 0.05
