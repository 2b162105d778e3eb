"""Tokenizer/index-build tests: corpus tokenization vs direct model calls,
dedup column vs O(N^2) oracle, and sequence lookup semantics
(reference modules/tokenizer/semids.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.datasets import ItemDataset, SeqDataset
from rqvae_tpu.data.synthetic import SyntheticConfig, generate
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

CFG = RqVaeConfig(
    input_dim=16,
    embed_dim=8,
    hidden_dims=(16,),
    codebook_size=8,
    n_layers=3,
    n_cat_feats=0,
    codebook_mode=QuantizeForwardMode.STE,
)


def _setup():
    data = generate(SyntheticConfig(n_items=300, n_users=60, input_dim=16, max_seq_len=10, seed=5))
    model = RqVae(CFG)
    x0 = jnp.asarray(data["item_features"][:64])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x0, 0.2, training=True
    )
    params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, x0)
    tok = SemanticIdTokenizer(model, params, tokenize_batch_size=128)
    return data, model, params, tok


class TestPrecompute:
    def test_ids_match_direct_encoding_and_batch_invariance(self):
        data, model, params, tok = _setup()
        cached = np.asarray(tok.precompute_corpus_ids(data["item_features"]))
        assert cached.shape == (300, 4)
        direct = np.asarray(
            model.apply(
                params,
                jnp.asarray(data["item_features"]),
                training=False,
                method=RqVae.get_semantic_ids,
            ).sem_ids
        )
        np.testing.assert_array_equal(cached[:, :3], direct)

        # different tokenize batch size -> identical result (the reference's
        # sequential 512-batching has no effect on values either)
        tok2 = SemanticIdTokenizer(model, params, tokenize_batch_size=37)
        cached2 = np.asarray(tok2.precompute_corpus_ids(data["item_features"]))
        np.testing.assert_array_equal(cached, cached2)

    def test_mesh_sharded_build_matches_unsharded(self):
        """Index build over a device mesh (per-shard encode via shard_map,
        global dedup) must equal the single-device build — both the XLA
        lax.map path and the Pallas kernel (interpret on CPU)."""
        from jax.sharding import Mesh

        data, model, params, tok = _setup()
        base = np.asarray(tok.precompute_corpus_ids(data["item_features"]))
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        tok_mesh = SemanticIdTokenizer(model, params, tokenize_batch_size=128, mesh=mesh)
        got = np.asarray(tok_mesh.precompute_corpus_ids(data["item_features"]))
        np.testing.assert_array_equal(base, got)

        tok_pl = SemanticIdTokenizer(
            model, params, tokenize_batch_size=128, mesh=mesh,
            use_pallas=True, pallas_precision="f32",
        )
        got_pl = np.asarray(tok_pl.precompute_corpus_ids(data["item_features"]))
        np.testing.assert_array_equal(base, got_pl)

    def test_dedup_column_oracle(self):
        data, model, params, tok = _setup()
        cached = np.asarray(tok.precompute_corpus_ids(data["item_features"]))
        ids = cached[:, :3]
        for i in [0, 17, 150, 299]:
            expected = sum((ids[j] == ids[i]).all() for j in range(i))
            assert cached[i, 3] == expected


class TestSequenceLookup:
    def test_lookup_and_masking(self):
        data, model, params, tok = _setup()
        tok.precompute_corpus_ids(data["item_features"])
        ds = SeqDataset(data, split="eval")
        batch = ds.batch(np.arange(12))
        out = tok(batch)
        B, N = batch.ids.shape
        D = 4
        assert out.sem_ids.shape == (B, N * D)
        assert out.sem_ids_fut.shape == (B, D)
        cached = np.asarray(tok.cached_ids)
        sem = np.asarray(out.sem_ids).reshape(B, N, D)
        for b in range(B):
            for n in range(N):
                if batch.ids[b, n] >= 0:
                    np.testing.assert_array_equal(sem[b, n], cached[batch.ids[b, n]])
                else:
                    assert (sem[b, n] == -1).all()
            np.testing.assert_array_equal(
                np.asarray(out.sem_ids_fut[b]), cached[batch.ids_fut[b]]
            )

    def test_token_type_ids(self):
        data, model, params, tok = _setup()
        tok.precompute_corpus_ids(data["item_features"])
        ds = SeqDataset(data, split="eval")
        out = tok(ds.batch(np.arange(4)))
        tt = np.asarray(out.token_type_ids)
        N = ds.max_seq_len
        np.testing.assert_array_equal(tt[0], np.tile(np.arange(4), N))
        np.testing.assert_array_equal(np.asarray(out.token_type_ids_fut)[0], np.arange(4))

    def test_raises_without_precompute(self):
        data, model, params, tok = _setup()
        ds = SeqDataset(data, split="eval")
        try:
            tok(ds.batch(np.arange(2)))
            assert False, "expected RuntimeError"
        except RuntimeError:
            pass
