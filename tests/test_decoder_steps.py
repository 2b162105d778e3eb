"""Stage-2 step-level tests: gradient accumulation == big batch (reference
train_decoder.py:181-187 semantics) and per-batch seq-length quantile
telemetry (reference modules/utils.py:25-44)."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.train.decoder_steps import (
    make_decoder_fused_train_step,
    make_decoder_train_step,
)
from rqvae_tpu.train.state import TrainState, adamw


def _setup(K=16, L=3, n_items=32, d_model=32):
    cfg = RetrievalConfig(
        num_hierarchies=L,
        codebook_size=K,
        t5_d_model=d_model,
        t5_d_kv=8,
        t5_num_heads=4,
        t5_d_ff=64,
        t5_num_layers=1,
        t5_dropout=0.0,  # deterministic: accumulation equality needs no rng
        top_k_for_generation=5,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)

    R, T, ml = 24, 12, 6
    seq_items = rng.randint(0, n_items, (R, T)).astype(np.int32)
    seq_lengths = rng.randint(5, T + 1, R).astype(np.int32)
    for r in range(R):
        seq_items[r, seq_lengths[r]:] = -1
    user_ids = rng.randint(0, 100, R).astype(np.int32)
    cached = rng.randint(0, K, (n_items, L + 1)).astype(np.int32)
    cached[:, -1] = 0  # dedup column
    return model, cfg, (
        jnp.asarray(seq_items),
        jnp.asarray(seq_lengths),
        jnp.asarray(user_ids),
        jnp.asarray(cached),
    ), ml


class TestDecoderAccumulation:
    def test_accumulated_equals_big_batch(self):
        # accum=2 micro-batches of B (deterministic eval windows, no dropout)
        # must produce the same update as one 2B batch through the plain step.
        model, cfg, (seq_items, seq_lengths, user_ids, cached), ml = _setup()
        from rqvae_tpu.data.jax_sampling import eval_windows
        from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

        B = 8
        row_idx = jnp.asarray(np.random.RandomState(1).randint(0, seq_items.shape[0], 2 * B))

        # reference big batch: same deterministic windows over all 2B rows
        L = seq_lengths[row_idx]
        hist_end = jnp.maximum(L - 2, 1)
        hist, fut = eval_windows(seq_items, seq_lengths, row_idx, hist_end, ml)
        big_batch = _tokenize_from_cache(cached, user_ids[row_idx], hist, fut, hist >= 0)

        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            big_batch,
            training=True,
        )
        tx = adamw(1e-3)

        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        fused = make_decoder_fused_train_step(
            model, tx, max_seq_len=ml, leave_two_out=True, subsample=False, accum=2
        )
        st_a, m_a = fused(
            TrainState.create(copy(params), tx),
            seq_items, seq_lengths, user_ids, cached, row_idx,
            jax.random.PRNGKey(7),
        )

        plain = make_decoder_train_step(model, tx)
        st_b, m_b = plain(TrainState.create(copy(params), tx), big_batch, jax.random.PRNGKey(8))

        np.testing.assert_allclose(
            float(m_a["total_loss"]), float(m_b["total_loss"]), rtol=1e-5
        )
        for pa, pb in zip(
            jax.tree_util.tree_leaves(st_a.params), jax.tree_util.tree_leaves(st_b.params)
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=1e-6)

    def test_accum_knob_changes_training(self):
        # accum=1 vs accum=2 on the same row pool must give different updates
        # (proves the knob is actually wired, VERDICT round-1 Missing #2).
        model, cfg, data, ml = _setup()
        seq_items, seq_lengths, user_ids, cached = data
        B = 8
        row_idx = jnp.asarray(np.random.RandomState(2).randint(0, seq_items.shape[0], 2 * B))
        params_batch_rows = row_idx[:B]

        from rqvae_tpu.data.jax_sampling import eval_windows
        from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

        L = seq_lengths[params_batch_rows]
        hist, fut = eval_windows(
            seq_items, seq_lengths, params_batch_rows, jnp.maximum(L - 2, 1), ml
        )
        example = _tokenize_from_cache(cached, user_ids[params_batch_rows], hist, fut, hist >= 0)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            example,
            training=True,
        )
        tx = adamw(1e-3)

        one = make_decoder_fused_train_step(
            model, tx, max_seq_len=ml, leave_two_out=True, subsample=False, accum=1
        )
        two = make_decoder_fused_train_step(
            model, tx, max_seq_len=ml, leave_two_out=True, subsample=False, accum=2
        )
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        st1, _ = one(
            TrainState.create(copy(params), tx), seq_items, seq_lengths, user_ids, cached,
            row_idx[:B], jax.random.PRNGKey(3),
        )
        st2, _ = two(
            TrainState.create(copy(params), tx), seq_items, seq_lengths, user_ids, cached,
            row_idx, jax.random.PRNGKey(3),
        )
        diffs = [
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(st1.params), jax.tree_util.tree_leaves(st2.params)
            )
        ]
        assert max(diffs) > 0.0

    def test_seq_length_quantile_metrics_per_batch(self):
        model, cfg, data, ml = _setup()
        seq_items, seq_lengths, user_ids, cached = data
        row_idx = jnp.asarray(np.random.RandomState(3).randint(0, seq_items.shape[0], 8))

        from rqvae_tpu.data.jax_sampling import eval_windows
        from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

        L = seq_lengths[row_idx]
        hist, fut = eval_windows(seq_items, seq_lengths, row_idx, jnp.maximum(L - 2, 1), ml)
        batch = _tokenize_from_cache(cached, user_ids[row_idx], hist, fut, hist >= 0)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            training=True,
        )
        tx = adamw(1e-3)
        step = make_decoder_train_step(model, tx)
        _, metrics = step(TrainState.create(params, tx), batch, jax.random.PRNGKey(0))

        # oracle: quantiles of this batch's token-level mask sums
        lengths = np.sum(np.asarray(batch.seq_mask), axis=1).astype(np.float64)
        for q in (25, 50, 75, 90, 100):
            np.testing.assert_allclose(
                float(metrics[f"seq_length_p{q}"]),
                np.quantile(lengths, q / 100),
                rtol=1e-5,
            )
