"""Serving Retriever tests: end-to-end history -> item ids."""

import jax
import numpy as np

from rqvae_tpu.data.synthetic import SyntheticConfig, generate
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
from rqvae_tpu.serving.retriever import Retriever
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

import jax.numpy as jnp


def _setup():
    data = generate(SyntheticConfig(n_items=200, n_users=20, input_dim=16, max_seq_len=8, seed=9))
    vae_cfg = RqVaeConfig(
        input_dim=16,
        embed_dim=8,
        hidden_dims=(16,),
        codebook_size=8,
        n_layers=3,
        n_cat_feats=0,
        codebook_mode=QuantizeForwardMode.STE,
    )
    rq = RqVae(vae_cfg)
    x0 = jnp.asarray(data["item_features"][:64])
    rq_params = rq.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x0, 0.2, training=True
    )
    rq_params = kmeans_init_codebooks(jax.random.PRNGKey(2), rq, rq_params, x0)
    tok = SemanticIdTokenizer(rq, rq_params)
    tok.precompute_corpus_ids(data["item_features"])

    cfg = RetrievalConfig(
        num_hierarchies=3,
        codebook_size=8,
        t5_d_model=32,
        t5_d_kv=8,
        t5_num_heads=4,
        t5_d_ff=64,
        t5_num_layers=1,
        t5_dropout=0.0,
        top_k_for_generation=5,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    hist = data["seq_items"][:6, :8]
    from rqvae_tpu.data.schemas import SeqBatch

    batch = SeqBatch(
        user_ids=jnp.zeros(6, jnp.int32),
        ids=jnp.asarray(hist),
        ids_fut=jnp.zeros(6, jnp.int32),
        x=jnp.zeros((6, 0, 0)),
        x_fut=jnp.zeros((6, 0)),
        seq_mask=jnp.asarray(hist >= 0),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tok(batch),
        training=True,
    )
    return data, model, params, tok, hist


class TestRetriever:
    def test_retrieve_returns_real_items(self):
        data, model, params, tok, hist = _setup()
        r = Retriever(model, params, tok)
        out = r.retrieve(hist)
        items = np.asarray(out.item_ids)
        assert items.shape == (6, 5)
        cached = np.asarray(tok.cached_ids)
        for b in range(6):
            for j in range(5):
                if items[b, j] >= 0:
                    # retrieved item's tuple matches the generated tuple
                    np.testing.assert_array_equal(
                        cached[items[b, j], :3], np.asarray(out.sem_ids[b, j])
                    )
        # every finite-logp beam resolves to a corpus item (the trie
        # guarantees generated tuples exist in the corpus)
        logp = np.asarray(out.log_probas)
        assert ((items >= 0) == (logp > -1e8)).all()

    def test_duplicate_tuples_resolve_to_earliest_item(self):
        data, model, params, tok, hist = _setup()
        cached = np.asarray(tok.cached_ids)
        r = Retriever(model, params, tok)
        out = r.retrieve(hist)
        items = np.asarray(out.item_ids)
        for b in range(items.shape[0]):
            for j in range(items.shape[1]):
                it = items[b, j]
                if it >= 0:
                    assert cached[it, 3] == 0  # dedup column: earliest duplicate


class TestShardedRetriever:
    """Scale-out serving: batch-sharded generate via shard_map
    (serving/retriever.py::make_shardmap_generate) must be invisible to
    results — beam search is row-independent, so sharding the batch over
    the mesh changes nothing but placement."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()[:8]), ("data",))

    def test_sharded_query_equals_single(self):
        data, model, params, tok, _ = _setup()
        hist = data["seq_items"][:8, :8]  # 8 rows / 8 devices
        plain = Retriever(model, params, tok).retrieve(hist)
        sharded = Retriever(model, params, tok, mesh=self._mesh()).retrieve(hist)
        np.testing.assert_array_equal(np.asarray(plain.item_ids), np.asarray(sharded.item_ids))
        np.testing.assert_array_equal(np.asarray(plain.sem_ids), np.asarray(sharded.sem_ids))
        np.testing.assert_allclose(
            np.asarray(plain.log_probas), np.asarray(sharded.log_probas), rtol=1e-6, atol=1e-6
        )

    def test_sharded_query_with_kernels_interpret(self, monkeypatch):
        """The Pallas serving kernels (decoder-stack + encoder-stack,
        interpret mode) running PER-SHARD inside the shard_map must also
        leave results unchanged."""
        import rqvae_tpu.models.t5 as t5mod
        from dataclasses import replace

        monkeypatch.setattr(t5mod, "FUSED_ENCODE_MIN_LEN", 4)
        data, model, params, tok, _ = _setup()
        hist = data["seq_items"][:8, :8]
        plain = Retriever(model, params, tok).retrieve(hist)
        kmodel = EncoderDecoderRetrievalModel(
            replace(model.config, t5_fused_decode="interpret", t5_fused_encode="interpret")
        )
        sharded = Retriever(kmodel, params, tok, mesh=self._mesh()).retrieve(hist)
        np.testing.assert_array_equal(np.asarray(plain.sem_ids), np.asarray(sharded.sem_ids))
        np.testing.assert_array_equal(np.asarray(plain.item_ids), np.asarray(sharded.item_ids))

    def test_sampled_mode_sharded_returns_valid_items(self):
        from dataclasses import replace

        data, model, params, tok, _ = _setup()
        hist = data["seq_items"][:8, :8]
        smodel = EncoderDecoderRetrievalModel(
            replace(model.config, sample_candidates=True, n_candidates=8)
        )
        out = Retriever(smodel, params, tok, mesh=self._mesh(), seed=7).retrieve(hist)
        cached = np.asarray(tok.cached_ids)
        items = np.asarray(out.item_ids)
        logp = np.asarray(out.log_probas)
        assert ((items >= 0) == (logp > -1e8)).all()
        for b in range(items.shape[0]):
            for j in range(items.shape[1]):
                if items[b, j] >= 0:
                    np.testing.assert_array_equal(
                        cached[items[b, j], :3], np.asarray(out.sem_ids[b, j])
                    )
