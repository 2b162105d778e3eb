"""Beam-search edge cases: padded histories, tiny corpora, k > corpus."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.serving.beam import build_prefix_table
from rqvae_tpu.train.decoder_steps import make_generate_fn
from tests.test_retrieval import CFG, L, K, _make_batch


def _init(cfg=CFG, seed=0, batch_kw=None):
    rng = np.random.RandomState(seed)
    batch, corpus = _make_batch(rng, **(batch_kw or {}))
    model = EncoderDecoderRetrievalModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        batch,
        training=True,
    )
    return model, params, batch, corpus


class TestGenerationEdges:
    def test_padding_invariance(self):
        model, params, batch, corpus = _init()
        table = build_prefix_table(jnp.asarray(corpus), K)
        gen = make_generate_fn(model)
        out1 = gen(params, batch, table)
        m = np.asarray(batch.seq_mask)
        assert (~m).any()
        sem2 = np.asarray(batch.sem_ids).copy()
        sem2[~m] = 5  # garbage at padded positions
        out2 = gen(params, batch._replace(sem_ids=jnp.asarray(sem2)), table)
        np.testing.assert_array_equal(np.asarray(out1.sem_ids), np.asarray(out2.sem_ids))
        np.testing.assert_allclose(
            np.asarray(out1.log_probas), np.asarray(out2.log_probas), atol=1e-5
        )

    def test_corpus_smaller_than_k(self):
        # corpus of 3 distinct tuples but top_k 5: the 3 real tuples are
        # returned first, the rest carry -inf-ish scores
        rng = np.random.RandomState(1)
        corpus = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 0]])
        model, params, batch, _ = _init(batch_kw={"corpus": corpus})
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(params, batch, table)
        ids = np.asarray(out.sem_ids)
        logp = np.asarray(out.log_probas)
        existing = {tuple(r) for r in corpus}
        for b in range(ids.shape[0]):
            real = [j for j in range(ids.shape[1]) if logp[b, j] > -1e8]
            assert len(real) == 3
            assert {tuple(ids[b, j]) for j in real} == existing

    def test_single_item_corpus(self):
        corpus = np.array([[2, 3, 4]])
        model, params, batch, _ = _init(batch_kw={"corpus": corpus})
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(params, batch, table)
        ids = np.asarray(out.sem_ids)
        logp = np.asarray(out.log_probas)
        for b in range(ids.shape[0]):
            assert tuple(ids[b, 0]) == (2, 3, 4)
            assert (logp[b, 1:] < -1e8).all()
