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
