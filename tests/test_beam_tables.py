"""Dense-bitmap vs sorted-key prefix tables must agree exactly."""

import jax.numpy as jnp
import numpy as np

from rqvae_tpu.ops.dedup import pack_sem_id_tuples
from rqvae_tpu.serving.beam import build_prefix_table, is_valid_prefix, valid_children


class TestPrefixTableModes:
    def test_dense_and_sorted_agree(self):
        rng = np.random.RandomState(0)
        K, L = 16, 3
        corpus = jnp.asarray(rng.randint(0, K, (200, L)))
        dense = build_prefix_table(corpus, K)  # all levels fit dense
        sparse = build_prefix_table(corpus, K, dense_limit=0)  # force sorted
        assert all(t.dtype == jnp.bool_ for t in dense.level_keys)
        assert all(t.dtype != jnp.bool_ for t in sparse.level_keys)

        probes = jnp.asarray(rng.randint(0, K, (500, L)))
        for h in range(L):
            keys = pack_sem_id_tuples(probes[:, : h + 1], K)
            a = np.asarray(is_valid_prefix(dense, h, keys))
            b = np.asarray(is_valid_prefix(sparse, h, keys))
            np.testing.assert_array_equal(a, b)
            # oracle
            existing = {tuple(r) for r in np.asarray(corpus)[:, : h + 1]}
            want = np.array([tuple(r) in existing for r in np.asarray(probes)[:, : h + 1]])
            np.testing.assert_array_equal(a, want)

    def test_valid_children_row_equals_per_key(self):
        """The row-gather form must agree with scattered per-key lookups
        (and between dense and sorted backends) for every child id."""
        rng = np.random.RandomState(2)
        K, L = 16, 3
        corpus = jnp.asarray(rng.randint(0, K, (200, L)))
        dense = build_prefix_table(corpus, K)
        sparse = build_prefix_table(corpus, K, dense_limit=0)
        W = 1 << dense.bits
        for h in range(L):
            parents = pack_sem_id_tuples(
                jnp.asarray(rng.randint(0, K, (50, h))), K
            ) if h else jnp.zeros((50,), jnp.int32)
            rows_d = np.asarray(valid_children(dense, h, parents))
            rows_s = np.asarray(valid_children(sparse, h, parents))
            np.testing.assert_array_equal(rows_d, rows_s)
            child = jnp.arange(W, dtype=jnp.int32)
            keys = (parents[:, None] << dense.bits) | child[None, :]
            per_key = np.asarray(is_valid_prefix(dense, h, keys))
            np.testing.assert_array_equal(rows_d, per_key)

    def test_flagship_sizes_dense(self):
        rng = np.random.RandomState(1)
        corpus = jnp.asarray(rng.randint(0, 256, (1000, 3)))
        t = build_prefix_table(corpus, 256)
        # 256^3 = 16.7M <= 64M limit -> dense at every level, stored as
        # [K^h, 256] row bitmaps (children of one parent = one row)
        assert [tk.shape for tk in t.level_keys] == [
            (1, 256), (256, 256), (65536, 256)]
        assert all(tk.dtype == jnp.bool_ for tk in t.level_keys)
