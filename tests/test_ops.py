"""Unit tests for the ops/numerics core against numpy oracles and the
reference formulas (citations in each module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.ops import (
    gumbel_softmax_sample,
    sample_gumbel,
    l2norm,
    reconstruction_loss,
    categorical_reconstruction_loss,
    quantize_loss,
    kmeans,
    inverse_sqrt_schedule,
    TemperatureScheduler,
    TopKAccumulator,
    topk_hit_metrics,
    pack_sem_id_tuples,
    dedup_counts,
    tuple_entropy,
)
from rqvae_tpu.ops.dedup import codebook_usage


class TestGumbel:
    def test_gumbel_moments(self):
        key = jax.random.PRNGKey(0)
        g = sample_gumbel(key, (200_000,))
        # Gumbel(0,1): mean = Euler-Mascheroni, var = pi^2/6
        assert abs(float(g.mean()) - 0.5772) < 0.02
        assert abs(float(g.var()) - (np.pi**2) / 6) < 0.05

    def test_softmax_sample_is_distribution(self):
        key = jax.random.PRNGKey(1)
        logits = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        w = gumbel_softmax_sample(key, logits, temperature=0.5)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
        assert (np.asarray(w) >= 0).all()

    def test_low_temperature_approaches_argmax(self):
        key = jax.random.PRNGKey(2)
        logits = jnp.array([[10.0, 0.0, -10.0]])
        w = gumbel_softmax_sample(key, logits, temperature=1e-3)
        assert int(jnp.argmax(w)) == 0
        assert float(w.max()) > 0.999

    def test_without_replacement_distinct(self):
        # every draw of n indices must be distinct (reference model.py:345
        # uses torch.multinomial without replacement)
        from rqvae_tpu.ops import sample_without_replacement

        logp = jax.nn.log_softmax(jnp.asarray(np.random.RandomState(0).randn(64, 16)))
        idx = np.asarray(sample_without_replacement(jax.random.PRNGKey(0), logp, 8))
        assert idx.shape == (64, 8)
        for row in idx:
            assert len(set(row.tolist())) == 8
        # n = K exhausts the support: each row is a permutation of 0..K-1
        full = np.asarray(sample_without_replacement(jax.random.PRNGKey(1), logp, 16))
        for row in full:
            assert sorted(row.tolist()) == list(range(16))

    def test_without_replacement_first_draw_marginal(self):
        # the first index has the plain categorical marginal: chi-square
        # check against softmax(logp) over many draws
        from rqvae_tpu.ops import sample_without_replacement

        logp = jax.nn.log_softmax(jnp.asarray([0.5, -0.3, 1.2, 0.0]))
        n_draws = 20_000
        idx = np.asarray(
            sample_without_replacement(
                jax.random.PRNGKey(3), jnp.tile(logp, (n_draws, 1)), 2
            )
        )[:, 0]
        counts = np.bincount(idx, minlength=4)
        expect = np.asarray(jax.nn.softmax(logp)) * n_draws
        chi2 = float(((counts - expect) ** 2 / expect).sum())
        assert chi2 < 16.3, f"chi2={chi2} counts={counts} expect={expect}"  # df=3, p=0.001


class TestNormalize:
    def test_matches_torch_normalize_semantics(self):
        x = np.random.RandomState(0).randn(4, 7).astype(np.float32)
        out = np.asarray(l2norm(jnp.array(x)))
        expected = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_zero_vector_safe(self):
        out = np.asarray(l2norm(jnp.zeros((2, 3))))
        assert np.isfinite(out).all()


class TestLosses:
    def test_reconstruction_loss(self):
        rng = np.random.RandomState(0)
        x, x_hat = rng.randn(5, 9), rng.randn(5, 9)
        out = np.asarray(reconstruction_loss(jnp.array(x_hat), jnp.array(x)))
        np.testing.assert_allclose(out, ((x_hat - x) ** 2).sum(-1), rtol=1e-5)

    def test_categorical_loss_matches_formula(self):
        rng = np.random.RandomState(1)
        n_cat = 4
        x_hat = rng.randn(6, 10).astype(np.float32)
        x = rng.randn(6, 10).astype(np.float32)
        x[:, -n_cat:] = (x[:, -n_cat:] > 0).astype(np.float32)
        out = np.asarray(categorical_reconstruction_loss(jnp.array(x_hat), jnp.array(x), n_cat))
        dense = ((x_hat[:, :-n_cat] - x[:, :-n_cat]) ** 2).sum(-1)
        z, y = x_hat[:, -n_cat:], x[:, -n_cat:]
        bce = (np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))).sum(-1)
        np.testing.assert_allclose(out, dense + bce, rtol=1e-4)

    def test_categorical_loss_zero_feats_is_plain_mse(self):
        rng = np.random.RandomState(2)
        x_hat, x = rng.randn(3, 5), rng.randn(3, 5)
        a = categorical_reconstruction_loss(jnp.array(x_hat), jnp.array(x), 0)
        b = reconstruction_loss(jnp.array(x_hat), jnp.array(x))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_quantize_loss_value_and_gradients(self):
        rng = np.random.RandomState(3)
        q = jnp.array(rng.randn(4, 6).astype(np.float32))
        v = jnp.array(rng.randn(4, 6).astype(np.float32))
        beta = 0.25
        out = np.asarray(quantize_loss(q, v, beta))
        expected = ((np.asarray(q) - np.asarray(v)) ** 2).sum(-1) * (1 + beta)
        np.testing.assert_allclose(out, expected, rtol=1e-5)

        # Gradient wrt value only flows through the emb term (sg on query):
        gv = jax.grad(lambda vv: quantize_loss(q, vv, beta).sum())(v)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(-2 * (q - v)), rtol=1e-5)
        # Gradient wrt query only flows through the commitment term:
        gq = jax.grad(lambda qq: quantize_loss(qq, v, beta).sum())(q)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(2 * beta * (q - v)), rtol=1e-5)


class TestKmeans:
    def test_recovers_separated_clusters(self):
        rng = np.random.RandomState(0)
        centers = np.array([[0, 0], [10, 10], [-10, 10], [10, -10.0]])
        x = np.concatenate([c + 0.1 * rng.randn(50, 2) for c in centers]).astype(np.float32)
        out = kmeans(jax.random.PRNGKey(0), jnp.array(x), k=4)
        got = np.sort(np.asarray(out.centroids), axis=0)
        want = np.sort(centers, axis=0)
        np.testing.assert_allclose(got, want, atol=0.2)

    def test_assignment_consistent(self):
        rng = np.random.RandomState(1)
        x = rng.randn(100, 8).astype(np.float32)
        out = kmeans(jax.random.PRNGKey(1), jnp.array(x), k=10)
        d = ((x[:, None, :] - np.asarray(out.centroids)[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(out.assignment), d.argmin(1))

    def test_large_k_stays_finite_and_improves(self):
        # k close to n stresses the empty-cluster reseed path (kmeans.py:50-56).
        x = np.random.RandomState(2).randn(20, 4).astype(np.float32)
        out = kmeans(jax.random.PRNGKey(2), jnp.array(x), k=16)
        c = np.asarray(out.centroids)
        assert np.isfinite(c).all()
        inertia = (((x[:, None] - c[None]) ** 2).sum(-1)).min(1).sum()
        rand_c = x[np.random.RandomState(0).choice(20, 16, replace=False)]
        rand_inertia = (((x[:, None] - rand_c[None]) ** 2).sum(-1)).min(1).sum()
        assert inertia <= rand_inertia + 1e-5


class TestSchedules:
    def test_inverse_sqrt_matches_reference(self):
        # Reference (inv_sqrt.py): step = count+1; base through warmup, then
        # base * sqrt(warmup)/sqrt(step).
        base, warmup = 0.001, 100
        sched = inverse_sqrt_schedule(base, warmup)
        assert float(sched(0)) == pytest.approx(base)
        assert float(sched(99)) == pytest.approx(base)
        assert float(sched(100)) == pytest.approx(base * (100**0.5) / (101**0.5))
        assert float(sched(9999)) == pytest.approx(base * (100**0.5) / (10000**0.5))

    def test_temperature_scheduler(self):
        ts = TemperatureScheduler(t0=1.0, min_t=0.1, anneal_rate=0.01, step_size=10)
        t_vals = [ts.get_t(i) for i in range(100)]
        assert t_vals[0] == 1.0
        assert t_vals[-1] >= 0.1
        assert all(a >= b for a, b in zip(t_vals, t_vals[1:]))

    def test_closed_form_temperature_matches_stateful(self):
        # gumbel_temperature_at must reproduce the sequentially-driven
        # stateful scheduler exactly (it is what runs inside lax.scan)
        from rqvae_tpu.ops.schedules import gumbel_temperature_at

        for t0, min_t, rate, step_size in [
            (1.0, 0.1, 0.01, 10),
            (0.2, 0.05, 1e-4, 1000),
            (0.7, 0.3, 0.05, 7),
            (0.5, 0.4999, 0.001, 3),  # clamps almost immediately
        ]:
            ts = TemperatureScheduler(t0=t0, min_t=min_t, anneal_rate=rate, step_size=step_size)
            for i in range(3000):
                want = ts.get_t(i)
                got = float(gumbel_temperature_at(i, t0, min_t, rate, step_size))
                assert got == pytest.approx(want, rel=1e-5), (t0, rate, step_size, i)

    def test_closed_form_temperature_no_int32_overflow(self):
        # int32 TRACED step at the flagship 400k budget with a small
        # step_size: the exponent sum ~8e9 overflows int32 arithmetic;
        # must clamp to min_t, not blow up to inf/uniform sampling
        import jax
        import jax.numpy as jnp
        from rqvae_tpu.ops.schedules import gumbel_temperature_at

        got = float(
            jax.jit(lambda s: gumbel_temperature_at(s, 1.0, 0.1, 1e-5, 10))(
                jnp.int32(399_999)
            )
        )
        assert got == pytest.approx(0.1)


class TestTopKMetrics:
    def test_against_bruteforce(self):
        rng = np.random.RandomState(0)
        B, K, L = 32, 10, 3
        actual = rng.randint(0, 5, (B, L))
        top_k = rng.randint(0, 5, (B, K, L))
        # plant exact matches at known ranks
        top_k[0, 0] = actual[0]
        top_k[1, 7] = actual[1]
        stats = {k: float(v) for k, v in topk_hit_metrics(jnp.array(actual), jnp.array(top_k)).items()}

        # brute force oracle (reference metrics.py:16-25 semantics)
        ndcg, hits = 0.0, {1: 0, 5: 0, 10: 0}
        for b in range(B):
            ranks = [j for j in range(K) if (top_k[b, j] == actual[b]).all()]
            if ranks:
                r = min(ranks)
                ndcg += 1.0 / np.log2(r + 2)
                for k in hits:
                    hits[k] += int(r < k)
        assert stats["ndcg"] == pytest.approx(ndcg, rel=1e-4)
        for k in hits:
            assert stats[f"h@{k}"] == hits[k]
        assert stats["total"] == B

    def test_accumulator_reduce(self):
        acc = TopKAccumulator(ks=[1, 5, 10])
        actual = np.array([[1, 2, 3]])
        top_k = np.tile(np.array([[9, 9, 9]]), (1, 10, 1))
        top_k[0, 2] = [1, 2, 3]
        acc.accumulate(actual, top_k)
        acc.accumulate(actual, np.zeros((1, 10, 3), dtype=int))
        out = acc.reduce()
        assert out["h@1"] == 0.0
        assert out["h@5"] == pytest.approx(0.5)
        assert out["h@10"] == pytest.approx(0.5)
        assert out["ndcg"] == pytest.approx(0.5 / np.log2(4))


class TestDedup:
    def _oracle(self, ids):
        n = ids.shape[0]
        out = np.zeros(n, dtype=np.int32)
        for i in range(n):
            out[i] = sum((ids[j] == ids[i]).all() for j in range(i))
        return out

    def test_pack_unique_and_lexicographic(self):
        rng = np.random.RandomState(0)
        ids = rng.randint(0, 256, (500, 3))
        keys = np.asarray(pack_sem_id_tuples(jnp.array(ids), 256))
        uniq_tuples = len({tuple(r) for r in ids})
        assert len(np.unique(keys)) == uniq_tuples
        # lexicographic order preserved
        order = np.lexsort(ids.T[::-1])
        assert (np.diff(keys[order]) >= 0).all()

    def test_dedup_counts_match_oracle(self):
        rng = np.random.RandomState(1)
        ids = rng.randint(0, 3, (200, 3))  # small vocab -> many collisions
        got = np.asarray(dedup_counts(jnp.array(ids), 3))
        np.testing.assert_array_equal(got, self._oracle(ids))

    def test_dedup_no_duplicates(self):
        ids = np.arange(50)[:, None] * np.ones((1, 3), dtype=int)
        got = np.asarray(dedup_counts(jnp.array(ids), 64))
        np.testing.assert_array_equal(got, np.zeros(50, dtype=np.int32))

    def test_dense_dedup_matches_oracle_and_sort(self):
        from rqvae_tpu.ops.dedup import dedup_counts_dense, packed_key_space

        rng = np.random.RandomState(2)
        for n, K, chunk in [(200, 3, 64), (515, 4, 128), (64, 5, 64), (1000, 2, 256)]:
            ids = rng.randint(0, K, (n, 3))
            keys = pack_sem_id_tuples(jnp.array(ids), K)
            want = self._oracle(ids)
            got_dense = np.asarray(
                dedup_counts_dense(keys, key_space=packed_key_space(K, 3), chunk=chunk)
            )
            got_sort = np.asarray(dedup_counts(jnp.array(ids), K))
            np.testing.assert_array_equal(got_dense, want)
            np.testing.assert_array_equal(got_sort, want)

    def test_entropy_and_usage(self):
        ids = np.array([[0, 0], [0, 0], [1, 1], [2, 2]])
        keys = pack_sem_id_tuples(jnp.array(ids), 4)
        h = float(tuple_entropy(keys))
        p = np.array([2, 1, 1]) / 4
        assert h == pytest.approx(float(-(p * np.log(p)).sum()), rel=1e-5)
        usage = np.asarray(codebook_usage(jnp.array(ids), 4))
        np.testing.assert_allclose(usage, [3 / 4, 3 / 4])
