"""Retrieval model tests: offset/SEP/user-embedding semantics, training
loss, and constrained beam search (validity + learnability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import (
    EncoderDecoderRetrievalModel,
    RetrievalConfig,
    strip_dedup_col,
)
from rqvae_tpu.serving.beam import build_prefix_table, is_valid_prefix
from rqvae_tpu.ops.dedup import pack_sem_id_tuples
from rqvae_tpu.train.decoder_steps import (
    make_decoder_eval_step,
    make_decoder_train_step,
    make_generate_fn,
)
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.ops.schedules import inverse_sqrt_schedule

L, K = 3, 8
CFG = RetrievalConfig(
    num_hierarchies=L,
    codebook_size=K,
    t5_d_model=32,
    t5_d_kv=8,
    t5_num_heads=4,
    t5_d_ff=64,
    t5_num_layers=2,
    t5_dropout=0.0,
    top_k_for_generation=5,
    should_add_sep_token=True,
)


def _make_batch(rng, B=8, n_items=4, corpus=None):
    """Build a TokenizedSeqBatch the way the tokenizer would emit it."""
    D = L + 1
    if corpus is None:
        corpus = rng.randint(0, K, (50, L))
    n = corpus.shape[0]
    item_ids = rng.randint(0, n, (B, n_items))
    lengths = rng.randint(1, n_items + 1, B)
    dedup = np.zeros((n, 1), int)
    table = np.concatenate([corpus, dedup], 1)
    sem = table[item_ids].reshape(B, n_items * D)
    mask = (np.arange(n_items)[None, :] < lengths[:, None]).repeat(D, axis=1).reshape(B, -1)
    # repeat_interleave semantics: each item's D tokens share its mask
    mask = (
        (np.arange(n_items)[None, :] < lengths[:, None])[:, :, None]
        .repeat(D, axis=2)
        .reshape(B, n_items * D)
    )
    sem = np.where(mask, sem, -1)
    fut_items = rng.randint(0, n, B)
    return (
        TokenizedSeqBatch(
            user_ids=jnp.asarray(rng.randint(0, 100, B)),
            sem_ids=jnp.asarray(sem),
            sem_ids_fut=jnp.asarray(table[fut_items]),
            seq_mask=jnp.asarray(mask),
            token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
            token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
        ),
        corpus,
    )


def _init_model(cfg=CFG, seed=0):
    rng = np.random.RandomState(seed)
    batch, corpus = _make_batch(rng)
    model = EncoderDecoderRetrievalModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        batch,
        training=True,
    )
    return model, params, batch, corpus


class TestStripDedup:
    def test_strip(self):
        x = jnp.arange(2 * 8).reshape(2, 8)  # N=2 items, D=4
        out = np.asarray(strip_dedup_col(x, 4, 3))
        np.testing.assert_array_equal(out, [[0, 1, 2, 4, 5, 6], [8, 9, 10, 12, 13, 14]])


class TestForward:
    def test_loss_shapes_and_finite(self):
        model, params, batch, _ = _init_model()
        out = model.apply(params, batch, training=False)
        assert out.loss.shape == ()
        assert out.loss_d.shape == (L,)
        assert out.logits.shape == (8, L, K)
        assert np.isfinite(float(out.loss))
        # untrained: loss ~= L * ln(K)
        assert abs(float(out.loss) - L * np.log(K)) < 1.5

    def test_padding_invariance(self):
        # changing sem_ids at masked positions must not change the loss
        model, params, batch, _ = _init_model()
        sem = np.asarray(batch.sem_ids).copy()
        m = np.asarray(batch.seq_mask)
        assert (~m).any(), "need padded positions for this test"
        sem2 = sem.copy()
        sem2[~m] = 3  # arbitrary id instead of -1
        batch2 = batch._replace(sem_ids=jnp.asarray(sem2))
        l1 = float(model.apply(params, batch, training=False).loss)
        l2 = float(model.apply(params, batch2, training=False).loss)
        assert l1 == pytest.approx(l2, rel=1e-5)

    def test_user_embedding_path(self):
        cfg = RetrievalConfig(**{**CFG.__dict__, "num_user_bins": 16})
        model, params, batch, _ = _init_model(cfg)
        out = model.apply(params, batch, training=False)
        assert np.isfinite(float(out.loss))
        # different user -> different encoder context -> different loss
        batch2 = batch._replace(user_ids=batch.user_ids + 1)
        out2 = model.apply(params, batch2, training=False)
        assert float(out.loss) != pytest.approx(float(out2.loss))

    def test_no_sep_token_path(self):
        cfg = RetrievalConfig(**{**CFG.__dict__, "should_add_sep_token": False})
        model, params, batch, _ = _init_model(cfg)
        assert np.isfinite(float(model.apply(params, batch, training=False).loss))


class TestPrefixTable:
    def test_validity_lookup(self):
        rng = np.random.RandomState(0)
        corpus = rng.randint(0, K, (40, L))
        table = build_prefix_table(jnp.asarray(corpus), K)
        # every corpus prefix is valid at every level
        for h in range(L):
            keys = pack_sem_id_tuples(jnp.asarray(corpus[:, : h + 1]), K)
            assert bool(is_valid_prefix(table, h, keys).all())
        # a tuple absent from the corpus is invalid at the deepest level
        existing = {tuple(r) for r in corpus}
        while True:
            probe = tuple(rng.randint(0, K, L))
            if probe not in existing:
                break
        pk = pack_sem_id_tuples(jnp.asarray(np.array([probe])), K)
        assert not bool(is_valid_prefix(table, L - 1, pk)[0])


class TestGeneration:
    def test_all_generated_tuples_exist_in_corpus(self):
        model, params, batch, corpus = _init_model()
        table = build_prefix_table(jnp.asarray(corpus), K)
        gen_fn = make_generate_fn(model)
        out = gen_fn(params, batch, table)
        ids = np.asarray(out.sem_ids)  # [B, k, L]
        assert ids.shape == (8, CFG.top_k_for_generation, L)
        existing = {tuple(r) for r in corpus}
        logp = np.asarray(out.log_probas)
        for b in range(ids.shape[0]):
            for j in range(ids.shape[1]):
                if np.isfinite(logp[b, j]) and logp[b, j] > -1e8:
                    assert tuple(ids[b, j]) in existing
        # beams sorted by score
        assert (np.diff(logp, axis=1) <= 1e-5).all()

    def test_topk_beams_distinct(self):
        model, params, batch, corpus = _init_model()
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(params, batch, table)
        ids = np.asarray(out.sem_ids)
        logp = np.asarray(out.log_probas)
        for b in range(ids.shape[0]):
            real = [tuple(ids[b, j]) for j in range(ids.shape[1]) if logp[b, j] > -1e8]
            assert len(real) == len(set(real))

    def test_sampled_mode_runs_and_respects_corpus(self):
        cfg = RetrievalConfig(**{**CFG.__dict__, "sample_candidates": True, "n_candidates": 8})
        model, params, batch, corpus = _init_model(cfg)
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(params, batch, table, jax.random.PRNGKey(0))
        ids = np.asarray(out.sem_ids)
        logp = np.asarray(out.log_probas)
        existing = {tuple(r) for r in corpus}
        for b in range(ids.shape[0]):
            for j in range(ids.shape[1]):
                if logp[b, j] > -1e8:
                    assert tuple(ids[b, j]) in existing

    def test_sampled_mode_diverges_from_deterministic_on_flat_distributions(self):
        """With untrained (near-flat) per-level distributions and
        n_candidates << K, the sampled protocol must actually sample:
        different outputs from the deterministic exhaustive top-k, and
        different outputs across rng keys. (On a TRAINED peaked model the
        two modes can legitimately coincide — sampled scores are the
        unperturbed log-probs, so whenever the exact top-k survive the
        candidate draw the ranking is identical; see RESULTS.md
        head-to-head — this pins that the divergence exists where it
        should.)"""
        det_model, params, batch, corpus = _init_model()
        # n_candidates must be < K: n_cands = min(max(n_candidates, top_k), K),
        # so n_candidates >= K degenerates to exhaustive (identical to
        # deterministic by construction — scores are unperturbed log-probs)
        cfg = RetrievalConfig(**{**CFG.__dict__, "sample_candidates": True, "n_candidates": 5})
        samp_model = EncoderDecoderRetrievalModel(cfg)
        table = build_prefix_table(jnp.asarray(corpus), K)
        det = np.asarray(make_generate_fn(det_model)(params, batch, table).sem_ids)
        gen_s = make_generate_fn(samp_model)
        s0 = np.asarray(gen_s(params, batch, table, jax.random.PRNGKey(0)).sem_ids)
        s1 = np.asarray(gen_s(params, batch, table, jax.random.PRNGKey(1)).sem_ids)
        assert (s0 != det).any(), "sampled mode reproduced exhaustive top-k exactly"
        assert (s0 != s1).any(), "sampled mode ignored the rng key"

    def test_log_probas_match_model_scores(self):
        # for the top beam, recompute log p(tuple | context) by teacher forcing
        model, params, batch, corpus = _init_model()
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(params, batch, table)
        b = 0
        tup = out.sem_ids[b, 0]
        # teacher-forced forward on this batch row with fut = tup
        D = L + 1
        fut = jnp.concatenate([tup, jnp.zeros(1, tup.dtype)])[None]
        row = jax.tree_util.tree_map(lambda a: a[b : b + 1], batch)
        row = row._replace(sem_ids_fut=fut)
        mo = model.apply(params, row, training=False)
        logp = jax.nn.log_softmax(mo.logits, axis=-1)  # [1, L, K]
        expect = sum(float(logp[0, h, int(tup[h])]) for h in range(L))
        assert float(out.log_probas[b, 0]) == pytest.approx(expect, abs=1e-3)


class TestDecoderTraining:
    def test_loss_decreases_and_recall_improves(self):
        # tiny corpus with STRUCTURE: the future item equals the last context
        # item, so the model can learn to copy it.
        rng = np.random.RandomState(0)
        corpus = rng.randint(0, K, (20, L))
        model = EncoderDecoderRetrievalModel(CFG)
        D = L + 1
        table_np = np.concatenate([corpus, np.zeros((20, 1), int)], 1)

        def make_copy_batch(B=32, seed=0):
            r = np.random.RandomState(seed)
            n_items = 4
            item_ids = r.randint(0, 20, (B, n_items))
            sem = table_np[item_ids].reshape(B, n_items * D)
            mask = np.ones((B, n_items * D), bool)
            fut = table_np[item_ids[:, -1]]  # copy task
            return TokenizedSeqBatch(
                user_ids=jnp.asarray(r.randint(0, 10, B)),
                sem_ids=jnp.asarray(sem),
                sem_ids_fut=jnp.asarray(fut),
                seq_mask=jnp.asarray(mask),
                token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
                token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
            )

        batch0 = make_copy_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch0,
            training=True,
        )
        tx = adamw(inverse_sqrt_schedule(3e-3, 50))
        state = TrainState.create(params, tx)
        step = make_decoder_train_step(model, tx)
        first = None
        for i in range(150):
            state, m = step(state, make_copy_batch(seed=i), jax.random.PRNGKey(i))
            if first is None:
                first = float(m["total_loss"])
        last = float(m["total_loss"])
        assert last < first * 0.5, f"{first} -> {last}"

        # eval step runs
        ev = make_decoder_eval_step(model)(state.params, batch0)
        assert np.isfinite(float(ev["eval_loss"]))

        # generation should now retrieve the copied item in the top beams
        table = build_prefix_table(jnp.asarray(corpus), K)
        out = make_generate_fn(model)(state.params, batch0, table)
        ids = np.asarray(out.sem_ids)
        actual = np.asarray(batch0.sem_ids_fut)[:, :L]
        hit1 = np.mean([(ids[b, 0] == actual[b]).all() for b in range(ids.shape[0])])
        hit5 = np.mean(
            [any((ids[b, j] == actual[b]).all() for j in range(5)) for b in range(ids.shape[0])]
        )
        assert hit5 > 0.5, f"hit@5={hit5}, hit@1={hit1}"

        # sampled-candidate mode (without-replacement Gumbel top-k, reference
        # model.py:345): recall on the learned copy task stays close to the
        # deterministic mode — the parity-defining property VERDICT r1 flagged
        cfg_s = RetrievalConfig(
            **{**CFG.__dict__, "sample_candidates": True, "n_candidates": 4}
        )
        model_s = EncoderDecoderRetrievalModel(cfg_s)
        out_s = make_generate_fn(model_s)(state.params, batch0, table, jax.random.PRNGKey(0))
        ids_s = np.asarray(out_s.sem_ids)
        hit5_s = np.mean(
            [any((ids_s[b, j] == actual[b]).all() for j in range(5)) for b in range(ids_s.shape[0])]
        )
        assert hit5_s > 0.5, f"sampled-mode hit@5={hit5_s} vs deterministic {hit5}"
