"""Fused T5 attention kernel (ops/pallas/attention.py) vs the pure-JAX path.

Runs in interpreter mode on CPU. Parity surface: HF T5 attention as used by
the reference retrieval model (/root/reference/modules/model.py:77-96) —
no 1/sqrt(d) scale, additive relative-position bias shared across the
batch, padding mask, softmax-weight dropout.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.t5 import T5Stack, T5StackConfig
from rqvae_tpu.ops.pallas.attention import (
    attention_reference,
    dropout_keep_oracle,
    t5_attention,
)


def _inputs(seed=0, B=5, H=3, Lq=12, Lk=20, dk=16, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, Lq, dk), dtype)
    k = jnp.asarray(rng.randn(B, H, Lk, dk), dtype)
    v = jnp.asarray(rng.randn(B, H, Lk, dk), dtype)
    bias = jnp.asarray(rng.randn(H, Lq, Lk), jnp.float32)
    mask = jnp.asarray(rng.rand(B, Lk) > 0.25, jnp.int32).at[:, 0].set(1)
    return q, k, v, bias, mask


SEED = jnp.array([12345], jnp.int32)


class TestFusedAttention:
    def test_forward_matches_reference(self):
        q, k, v, bias, mask = _inputs()
        out = t5_attention(q, k, v, bias, mask, SEED, block_b=2, interpret=True)
        ref = attention_reference(q, k, v, bias, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match_reference(self):
        # B=5 with block_b=2 also exercises the grid-edge (ragged) block,
        # whose garbage rows must not pollute the cross-batch dbias sum
        q, k, v, bias, mask = _inputs()

        def lf(q, k, v, bias):
            o = t5_attention(q, k, v, bias, mask, SEED, block_b=2, interpret=True)
            return jnp.sum(jnp.tanh(o))

        def lr(q, k, v, bias):
            return jnp.sum(jnp.tanh(attention_reference(q, k, v, bias, mask)))

        gf = jax.grad(lf, (0, 1, 2, 3))(q, k, v, bias)
        gr = jax.grad(lr, (0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_causal(self):
        q, k, v, bias, mask = _inputs(B=4, Lq=16, Lk=16)
        out = t5_attention(q, k, v, bias, mask, SEED, causal=True, block_b=2, interpret=True)
        ref = attention_reference(q, k, v, bias, mask, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_fully_masked_rows_are_finite(self):
        q, k, v, bias, mask = _inputs(B=4)
        mask = mask.at[1].set(0)  # one batch row attends to nothing
        out = t5_attention(q, k, v, bias, mask, SEED, block_b=2, interpret=True)
        assert bool(jnp.isfinite(out).all())


class TestFusedAttentionDropout:
    RATE = 0.25

    def _dropped_probs(self, seed_arr, block_b=2):
        """With V = I and zero bias/full mask, the kernel output IS the
        dropped probability matrix — exposing the realized keep mask."""
        rng = np.random.RandomState(3)
        B, H, L = 4, 2, 32
        q = jnp.asarray(rng.randn(B, H, L, L), jnp.float32)
        k = jnp.asarray(rng.randn(B, H, L, L), jnp.float32)
        v = jnp.broadcast_to(jnp.eye(L, dtype=jnp.float32), (B, H, L, L))
        bias = jnp.zeros((H, L, L), jnp.float32)
        mask = jnp.ones((B, L), jnp.int32)
        out = t5_attention(
            q, k, v, bias, mask, seed_arr,
            dropout_rate=self.RATE, block_b=block_b, interpret=True,
        )
        return (q, k, v, bias, mask), out

    def test_deterministic_and_seed_sensitive(self):
        _, o1 = self._dropped_probs(SEED)
        _, o2 = self._dropped_probs(SEED)
        _, o3 = self._dropped_probs(jnp.array([999], jnp.int32))
        assert bool((o1 == o2).all())
        assert bool((o1 != o3).any())

    def test_block_size_invariant(self):
        _, o1 = self._dropped_probs(SEED, block_b=2)
        _, o2 = self._dropped_probs(SEED, block_b=4)
        assert bool((o1 == o2).all())

    def test_drop_rate_and_oracle_mask(self):
        _, out = self._dropped_probs(SEED)
        keep = np.asarray(out) != 0.0
        assert abs((1 - keep.mean()) - self.RATE) < 0.02
        oracle = np.asarray(dropout_keep_oracle(int(SEED[0]), *keep.shape[:2], *keep.shape[2:], self.RATE))
        assert (keep == oracle).all()

    def test_grads_match_reference_with_realized_mask(self):
        (q, k, v, bias, mask), out = self._dropped_probs(SEED)
        keep = jnp.asarray(np.asarray(out) != 0.0)

        def lf(q, k, v, bias):
            o = t5_attention(
                q, k, v, bias, mask, SEED,
                dropout_rate=self.RATE, block_b=2, interpret=True,
            )
            return jnp.sum(jnp.sin(o))

        def lr(q, k, v, bias):
            o = attention_reference(
                q, k, v, bias, mask, dropout_keep=keep, dropout_rate=self.RATE
            )
            return jnp.sum(jnp.sin(o))

        gf = jax.grad(lf, (0, 1, 2, 3))(q, k, v, bias)
        gr = jax.grad(lr, (0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestT5StackFusedAttention:
    """The T5 stack with fused_attention='interpret' == the XLA path."""

    CFG = T5StackConfig(
        d_model=64, d_kv=16, num_heads=4, d_ff=128, num_layers=2,
        dropout=0.0, fused_attention="off",
    )

    def _setup(self):
        rng = np.random.RandomState(0)
        B, L = 3, 24
        x = jnp.asarray(rng.randn(B, L, 64), jnp.float32)
        mask = jnp.asarray(rng.rand(B, L) > 0.2, jnp.int32).at[:, 0].set(1)
        enc = T5Stack(self.CFG, is_decoder=False)
        params = enc.init(jax.random.PRNGKey(0), x, self_mask=mask)
        return x, mask, params

    def test_encoder_forward_and_grads(self):
        x, mask, params = self._setup()
        fused_cfg = replace(self.CFG, fused_attention="interpret")
        out0 = T5Stack(self.CFG).apply(params, x, self_mask=mask)
        out1 = T5Stack(fused_cfg).apply(params, x, self_mask=mask)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)

        def loss(p, cfg):
            return jnp.sum(jnp.tanh(T5Stack(cfg).apply(p, x, self_mask=mask)))

        g0 = jax.grad(loss)(params, self.CFG)
        g1 = jax.grad(loss)(params, fused_cfg)
        err = max(
            jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1))
        )
        assert err < 1e-4, err

    def test_decoder_with_cross_attention(self):
        x, mask, params = self._setup()
        enc_out = T5Stack(self.CFG).apply(params, x, self_mask=mask)
        dec = T5Stack(self.CFG, is_decoder=True)
        pd = dec.init(jax.random.PRNGKey(1), x, self_mask=None, enc_out=enc_out, enc_mask=mask)
        d0 = dec.apply(pd, x, self_mask=None, enc_out=enc_out, enc_mask=mask)
        d1 = T5Stack(replace(self.CFG, fused_attention="interpret"), is_decoder=True).apply(
            pd, x, self_mask=None, enc_out=enc_out, enc_mask=mask
        )
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)

    def test_train_mode_dropout(self):
        x, mask, params = self._setup()
        cfg = replace(self.CFG, fused_attention="interpret", dropout=0.2)
        enc = T5Stack(cfg)
        o1 = enc.apply(params, x, self_mask=mask, training=True, rngs={"dropout": jax.random.PRNGKey(7)})
        o2 = enc.apply(params, x, self_mask=mask, training=True, rngs={"dropout": jax.random.PRNGKey(7)})
        o3 = enc.apply(params, x, self_mask=mask, training=True, rngs={"dropout": jax.random.PRNGKey(8)})
        assert bool((o1 == o2).all())
        assert bool((o1 != o3).any())
        assert bool(jnp.isfinite(o1).all())

    def test_bf16(self):
        x, mask, params = self._setup()
        cfg = replace(self.CFG, dtype="bfloat16")
        out0 = T5Stack(cfg).apply(params, x, self_mask=mask)
        out1 = T5Stack(replace(cfg, fused_attention="interpret")).apply(params, x, self_mask=mask)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=3e-2)
