"""Dense-bitmap vs sorted-key prefix tables must agree exactly."""

import jax.numpy as jnp
import numpy as np

from rqvae_tpu.ops.dedup import pack_sem_id_tuples
from rqvae_tpu.serving.beam import build_prefix_table, is_valid_prefix


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

    def test_flagship_sizes_dense(self):
        rng = np.random.RandomState(1)
        corpus = jnp.asarray(rng.randint(0, 256, (1000, 3)))
        t = build_prefix_table(corpus, 256)
        # 256^3 = 16.7M <= 64M limit -> dense at every level
        assert [tk.shape[0] for tk in t.level_keys] == [256, 65536, 16777216]
        assert all(tk.dtype == jnp.bool_ for tk in t.level_keys)
