"""Fused encoder-stack serving kernel (ops/pallas/encoder_stack.py).

The kernel must reproduce the XLA encoder path exactly: same RMSNorm
math, same key-only masking semantics (invalid query rows compute the
same deterministic values as the XLA path), same shared rel-pos bias.
Row padding to 8 sublanes must be invisible. Oracle = T5Stack.__call__
(the path tests/test_t5.py locks against HF).
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rqvae_tpu.models.t5 as t5mod
from rqvae_tpu.models.t5 import T5Stack, T5StackConfig

CFG = T5StackConfig(
    d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout=0.0,
    fused_encode="interpret",
)


@pytest.fixture
def small_gate(monkeypatch):
    monkeypatch.setattr(t5mod, "FUSED_ENCODE_MIN_LEN", 4)


def _setup(B=4, L=11, seed=0, dtype="float32", masked=True):
    cfg = replace(CFG, dtype=dtype)
    stack = T5Stack(cfg)
    xla_stack = T5Stack(replace(cfg, fused_encode="off"))  # same param tree
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, L, cfg.d_model).astype(np.float32))
    if masked:
        mask = jnp.asarray((r.rand(B, L) > 0.3).astype(np.int32))
        mask = mask.at[:, 0].set(1)  # no fully-masked rows
    else:
        mask = None
    params = xla_stack.init(jax.random.PRNGKey(seed), x, self_mask=mask)
    return stack, xla_stack, params, x, mask


class TestKernelOracle:
    @pytest.mark.parametrize("L,masked", [(8, True), (11, True), (16, False)])
    def test_matches_xla_stack(self, small_gate, L, masked):
        """Valid AND invalid rows match (key-only masking both paths);
        L=11 exercises the 8-sublane row padding."""
        stack, xla_stack, params, x, mask = _setup(L=L, masked=masked)
        want = xla_stack.apply(params, x, self_mask=mask)
        got = stack.apply(
            params, x, mask, interpret=True, method=T5Stack.fused_encode
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_bf16_close(self, small_gate):
        stack, xla_stack, params, x, mask = _setup(L=11, dtype="bfloat16")
        want = xla_stack.apply(params, x, self_mask=mask)
        got = stack.apply(
            params, x, mask, interpret=True, method=T5Stack.fused_encode
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
        )

    def test_call_routes_through_kernel(self, small_gate):
        """__call__ with fused_encode="interpret" must produce the kernel
        path's output (identical to XLA here, but proves the gate wiring
        by matching the explicit fused_encode call bit-for-bit)."""
        stack, _, params, x, mask = _setup(L=8)
        via_call = stack.apply(params, x, self_mask=mask)
        explicit = stack.apply(
            params, x, mask, interpret=True, method=T5Stack.fused_encode
        )
        np.testing.assert_array_equal(np.asarray(via_call), np.asarray(explicit))


class TestGeneratePath:
    def test_generate_fused_equals_xla(self, small_gate):
        """The full constrained beam search must be unchanged when the
        encoder routes through the fused kernel (f32, interpret mode)."""
        from rqvae_tpu.models.retrieval import (
            EncoderDecoderRetrievalModel,
            RetrievalConfig,
        )
        from rqvae_tpu.serving.beam import build_prefix_table
        from tests.test_retrieval import _make_batch

        outs = {}
        rng = np.random.RandomState(3)
        batch, corpus = _make_batch(rng)
        table = build_prefix_table(jnp.asarray(corpus), 8)
        for mode in ("interpret", "off"):
            cfg = RetrievalConfig(
                num_hierarchies=3, codebook_size=8, t5_d_model=32, t5_d_kv=8,
                t5_num_heads=4, t5_d_ff=64, t5_num_layers=2, t5_dropout=0.0,
                top_k_for_generation=5, t5_fused_encode=mode,
            )
            model = EncoderDecoderRetrievalModel(cfg)
            params = model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                batch, training=True,
            )
            outs[mode] = model.apply(
                params, batch.sem_ids, batch.seq_mask, batch.user_ids, table,
                method=EncoderDecoderRetrievalModel.generate,
            )
        np.testing.assert_array_equal(
            np.asarray(outs["interpret"].sem_ids), np.asarray(outs["off"].sem_ids)
        )
        np.testing.assert_allclose(
            np.asarray(outs["interpret"].log_probas),
            np.asarray(outs["off"].log_probas), rtol=1e-4, atol=1e-5,
        )


class TestGate:
    def test_modes(self):
        mk = lambda mode: T5Stack(replace(CFG, fused_encode=mode))
        long = t5mod.FUSED_ENCODE_MIN_LEN
        assert mk("off").use_fused_encode(long, training=False) is False
        assert mk("on").use_fused_encode(long, training=False) is True
        assert mk("interpret").use_fused_encode(long, training=False) == "interpret"
        # auto declines on CPU (and until the chip proof lands)
        assert mk("auto").use_fused_encode(long, training=False) is False
        # training and short rows always decline
        assert mk("on").use_fused_encode(long, training=True) is False
        assert mk("on").use_fused_encode(long - 1, training=False) is False
        # decoder stacks never take the encoder kernel
        dec = T5Stack(replace(CFG, fused_encode="on"), is_decoder=True)
        assert dec.use_fused_encode(long, training=False) is False

    def test_block_b_budget(self):
        from rqvae_tpu.ops.pallas.encoder_stack import _auto_block_b

        # ML-32M serving geometry: long rows force small blocks
        bb = _auto_block_b(64, 4, 6, 808, 64, 384, 1024, 2)
        assert 1 <= bb <= 8
        # Amazon-length rows would fit much larger blocks
        assert _auto_block_b(64, 4, 6, 88, 64, 384, 1024, 2) >= 16
