"""Pallas kernel tests (interpreter mode on CPU) against the pure-JAX path."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
from rqvae_tpu.ops.pallas.rq_encode import (
    encoder_weights_from_params,
    fused_encode_quantize,
    pallas_supported,
)
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

CFG = RqVaeConfig(
    input_dim=768,
    embed_dim=32,
    hidden_dims=(512, 256, 128),
    codebook_size=256,
    n_layers=3,
    n_cat_feats=0,
    codebook_mode=QuantizeForwardMode.STE,
)


def _setup(n=512, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(32, CFG.input_dim) * 2
    x = (centers[rng.randint(0, 32, n)] + 0.3 * rng.randn(n, CFG.input_dim)).astype(np.float32)
    model = RqVae(CFG)
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "gumbel": jax.random.PRNGKey(seed + 1)},
        jnp.asarray(x[:64]),
        0.2,
        training=True,
    )
    params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, jnp.asarray(x[:256]))
    return model, params, x


class TestFusedEncodeQuantize:
    def test_matches_pure_jax_path(self):
        model, params, x = _setup()
        ref_ids = np.asarray(
            model.apply(params, jnp.asarray(x), training=False, method=RqVae.get_semantic_ids).sem_ids
        )
        got = np.asarray(
            fused_encode_quantize(
                jnp.asarray(x),
                encoder_weights_from_params(params),
                params["params"]["codebooks"],
                n_levels=CFG.n_layers,
                block_rows=256,
                precision="f32",
                interpret=True,
            )
        )
        # identical argmins in f32 (ties are measure-zero on random data)
        match = (got == ref_ids).all(axis=1).mean()
        assert match >= 0.999, f"id agreement {match}"

    def test_supported_predicate(self):
        assert pallas_supported(CFG)
        assert not pallas_supported(RqVaeConfig(sim_vq=True))
        assert not pallas_supported(RqVaeConfig(codebook_normalize=True))

    def test_tokenizer_pallas_path_equivalence(self):
        model, params, x = _setup(n=500)  # non-multiple of block to test padding
        tok_xla = SemanticIdTokenizer(model, params, use_pallas=False)
        tok_pal = SemanticIdTokenizer(model, params, use_pallas=True, pallas_precision="f32")
        a = np.asarray(tok_xla.precompute_corpus_ids(x))
        b = np.asarray(tok_pal.precompute_corpus_ids(x))
        match = (a == b).all(axis=1).mean()
        assert match >= 0.999, f"cached_ids agreement {match}"

    def test_bf16_mode_self_consistent_and_close(self):
        # bf16 (the TPU default: f32 dots inside Pallas are ~13x slower on
        # v5e) flips some argmin ties vs f32 but must be deterministic and
        # mostly agree on clustered data.
        model, params, x = _setup(n=500)
        tok16 = SemanticIdTokenizer(model, params, use_pallas=True, pallas_precision="bf16")
        a = np.asarray(tok16.precompute_corpus_ids(x))
        b = np.asarray(tok16.precompute_corpus_ids(x))
        np.testing.assert_array_equal(a, b)  # self-consistent
        tok32 = SemanticIdTokenizer(model, params, use_pallas=True, pallas_precision="f32")
        c = np.asarray(tok32.precompute_corpus_ids(x))
        match = (a[:, :3] == c[:, :3]).all(axis=1).mean()
        assert match >= 0.8, f"bf16-vs-f32 agreement {match}"

    def test_device_corpus_cache_reused(self):
        model, params, x = _setup(n=500)
        tok = SemanticIdTokenizer(model, params, use_pallas=False)
        tok.precompute_corpus_ids(x)
        dev1 = tok._corpus_dev
        tok.precompute_corpus_ids(x)
        assert tok._corpus_dev is dev1

    def test_emit_packed_epilogue(self):
        # last column == pack_sem_id_tuples of the id columns
        from rqvae_tpu.ops.dedup import pack_sem_id_tuples

        model, params, x = _setup(n=512)
        weights = encoder_weights_from_params(params)
        cbs = params["params"]["codebooks"]
        out = fused_encode_quantize(
            jnp.asarray(x), weights, cbs, n_levels=3, block_rows=256,
            precision="f32", interpret=True, emit_packed=True,
        )
        assert out.shape == (512, 4)
        ids, packed = out[:, :3], out[:, 3]
        plain = fused_encode_quantize(
            jnp.asarray(x), weights, cbs, n_levels=3, block_rows=256,
            precision="f32", interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(plain))
        np.testing.assert_array_equal(
            np.asarray(packed), np.asarray(pack_sem_id_tuples(ids, 256))
        )
