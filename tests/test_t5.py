"""T5 stack tests: shapes, masking semantics, causality, relative-position
bucketing vs the HF formula."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.t5 import (
    RMSNorm,
    T5Stack,
    T5StackConfig,
    relative_position_bucket,
)

CFG = T5StackConfig(d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=2, dropout=0.0)


def _hf_bucket_oracle(rel, bidirectional, num_buckets=32, max_distance=128):
    """Direct port of the HF T5 formula as an independent numpy oracle."""
    ret = 0
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0) * num_buckets
        n = abs(n)
    else:
        n = max(n, 0)
    max_exact = num_buckets // 2
    if n < max_exact:
        return ret + n
    val = max_exact + int(
        np.log(n / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    )
    return ret + min(val, num_buckets - 1)


class TestRelativeBucket:
    def test_matches_oracle_bidirectional(self):
        rel = jnp.arange(-200, 201).reshape(1, -1)
        got = np.asarray(relative_position_bucket(rel, True))
        want = np.array([[_hf_bucket_oracle(int(r), True) for r in rel[0]]])
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_causal(self):
        rel = jnp.arange(-200, 201).reshape(1, -1)
        got = np.asarray(relative_position_bucket(rel, False))
        want = np.array([[_hf_bucket_oracle(int(r), False) for r in rel[0]]])
        np.testing.assert_array_equal(got, want)


class TestRMSNorm:
    def test_matches_t5_layernorm(self):
        x = jnp.array(np.random.RandomState(0).randn(3, 5).astype(np.float32))
        m = RMSNorm()
        p = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(p, x))
        xn = np.asarray(x)
        want = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(out, want, atol=1e-5)


def _init_stack(is_decoder=False, seed=0):
    stack = T5Stack(CFG, is_decoder=is_decoder)
    B, L = 2, 6
    x = jnp.array(np.random.RandomState(seed).randn(B, L, CFG.d_model).astype(np.float32))
    if is_decoder:
        enc = jnp.array(np.random.RandomState(seed + 1).randn(B, 4, CFG.d_model).astype(np.float32))
        enc_mask = jnp.ones((B, 4), jnp.int32)
        params = stack.init(jax.random.PRNGKey(seed), x, enc_out=enc, enc_mask=enc_mask)
        return stack, params, x, enc, enc_mask
    params = stack.init(jax.random.PRNGKey(seed), x)
    return stack, params, x


class TestEncoder:
    def test_shapes(self):
        stack, params, x = _init_stack()
        out = stack.apply(params, x)
        assert out.shape == x.shape

    def test_padding_mask_blocks_information(self):
        stack, params, x = _init_stack()
        mask = jnp.array([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32)
        out1 = stack.apply(params, x, self_mask=mask)
        # perturb masked positions: valid outputs must not change
        x2 = x.at[:, 3:].set(99.0)
        out2 = stack.apply(params, x2, self_mask=mask)
        np.testing.assert_allclose(np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


class TestDecoder:
    def test_causality(self):
        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        out1 = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask)
        # perturb future positions: past outputs must not change
        x2 = x.at[:, 4:].set(-50.0)
        out2 = stack.apply(params, x2, enc_out=enc, enc_mask=enc_mask)
        np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5)
        assert not np.allclose(np.asarray(out1[:, 4:]), np.asarray(out2[:, 4:]))

    def test_cross_attention_uses_encoder(self):
        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        out1 = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask)
        out2 = stack.apply(params, x, enc_out=enc + 1.0, enc_mask=enc_mask)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_encoder_mask_blocks_encoder_positions(self):
        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        mask = jnp.array([[1, 1, 0, 0]] * 2, jnp.int32)
        out1 = stack.apply(params, x, enc_out=enc, enc_mask=mask)
        enc2 = enc.at[:, 2:].set(77.0)
        out2 = stack.apply(params, x, enc_out=enc2, enc_mask=mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_dropout_rng_changes_output(self):
        cfg = T5StackConfig(d_model=32, d_kv=8, num_heads=4, d_ff=64, num_layers=1, dropout=0.5)
        stack = T5Stack(cfg)
        x = jnp.ones((1, 4, 32))
        params = stack.init(jax.random.PRNGKey(0), x)
        a = stack.apply(params, x, training=True, rngs={"dropout": jax.random.PRNGKey(1)})
        b = stack.apply(params, x, training=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # deterministic path ignores rng
        c = stack.apply(params, x, training=False)
        d = stack.apply(params, x, training=False)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


class TestRematAndBeams:
    def test_remat_matches_no_remat_forward_and_grad(self):
        from dataclasses import replace

        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        stack_r = T5Stack(replace(CFG, remat=True), is_decoder=True)

        def loss(s):
            def f(p):
                return jnp.sum(s.apply(p, x, enc_out=enc, enc_mask=enc_mask) ** 2)

            return f

        out = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask)
        out_r = stack_r.apply(params, x, enc_out=enc, enc_mask=enc_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)
        g = jax.grad(loss(stack))(params)
        g_r = jax.grad(loss(stack_r))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
            g,
            g_r,
        )

    def test_beam_folded_cross_attention_matches_replicated(self):
        """beams=k over [B, Le] enc must equal beams=1 over the k-replicated
        encoder output (the reference's repeat_interleave layout)."""
        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        B, k = x.shape[0], 3
        xk = jnp.repeat(x, k, axis=0)  # [B*k, T, d]
        enc_rep = jnp.repeat(enc, k, axis=0)
        mask_rep = jnp.repeat(enc_mask, k, axis=0)
        folded = stack.apply(params, xk, enc_out=enc, enc_mask=enc_mask, beams=k)
        replicated = stack.apply(params, xk, enc_out=enc_rep, enc_mask=mask_rep)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(replicated), atol=1e-5)
        # remat path takes the same static args
        from dataclasses import replace

        stack_r = T5Stack(replace(CFG, remat=True), is_decoder=True)
        folded_r = stack_r.apply(params, xk, enc_out=enc, enc_mask=enc_mask, beams=k)
        np.testing.assert_allclose(np.asarray(folded_r), np.asarray(folded), atol=1e-6)

    def test_cross_kv_cache_is_exact(self):
        """Precomputed cross-attention K/V (T5Stack.cross_kv, the beam-search
        cache) must be BITWISE identical to the per-call projection — same
        GEMMs, just hoisted out of the decode stages."""
        stack, params, x, enc, enc_mask = _init_stack(is_decoder=True)
        kv = stack.apply(params, enc, method=T5Stack.cross_kv)
        assert len(kv) == CFG.num_layers and len(kv[0]) == 2
        cached = stack.apply(params, x, enc_out=None, enc_mask=enc_mask, cross_kv=kv)
        plain = stack.apply(params, x, enc_out=enc, enc_mask=enc_mask)
        np.testing.assert_array_equal(np.asarray(cached), np.asarray(plain))
        # beam-folded path too
        B, k = x.shape[0], 3
        xk = jnp.repeat(x, k, axis=0)
        cached_k = stack.apply(params, xk, enc_out=None, enc_mask=enc_mask, beams=k, cross_kv=kv)
        plain_k = stack.apply(params, xk, enc_out=enc, enc_mask=enc_mask, beams=k)
        np.testing.assert_array_equal(np.asarray(cached_k), np.asarray(plain_k))


class TestFusedGate:
    """_use_fused policy (models/t5.py): training always fused on 1-device
    TPU above the tiny-size floor; inference fused ONLY at long rows
    (measured crossover between L=256 and L=512, RESULTS.md r3)."""

    def _gate(self, monkeypatch, mode, lq, lk, training, backend="tpu", ndev=1):
        from rqvae_tpu.models.t5 import T5Attention, T5StackConfig
        import rqvae_tpu.models.t5 as t5mod

        monkeypatch.setattr(t5mod.jax, "default_backend", lambda: backend)
        monkeypatch.setattr(t5mod.jax, "device_count", lambda: ndev)
        attn = T5Attention(T5StackConfig(fused_attention=mode))
        return attn._use_fused(lq, lk, training)

    def test_training_gate(self, monkeypatch):
        assert self._gate(monkeypatch, "auto", 84, 84, True)
        assert self._gate(monkeypatch, "auto", 804, 804, True)
        assert not self._gate(monkeypatch, "auto", 4, 84, True)  # decoder attn
        assert not self._gate(monkeypatch, "auto", 84, 84, True, backend="cpu")
        assert not self._gate(monkeypatch, "auto", 84, 84, True, ndev=8)  # GSPMD
        assert self._gate(monkeypatch, "on", 84, 84, True, ndev=8)  # shard_map promotes

    def test_inference_long_row_gate(self, monkeypatch):
        assert not self._gate(monkeypatch, "auto", 84, 84, False)  # XLA wins short
        assert not self._gate(monkeypatch, "auto", 256, 256, False)
        assert self._gate(monkeypatch, "auto", 512, 512, False)
        assert self._gate(monkeypatch, "auto", 804, 804, False)  # 2.55x beam win
        assert not self._gate(monkeypatch, "off", 804, 804, False)
