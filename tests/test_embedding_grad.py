"""Matmul-backward embedding lookup equals the scatter-add gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.ops.embedding import embedding_lookup


class TestEmbeddingLookup:
    def test_forward_identical(self):
        table = jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))
        ids = jnp.asarray(np.random.RandomState(1).randint(0, 16, (3, 5)))
        np.testing.assert_array_equal(
            np.asarray(embedding_lookup(table, ids)), np.asarray(table[ids])
        )

    def test_gradient_matches_scatter(self):
        rng = np.random.RandomState(2)
        table = jnp.asarray(rng.randn(16, 8).astype(np.float32))
        ids = jnp.asarray(rng.randint(0, 16, (4, 7)))
        w = jnp.asarray(rng.randn(4, 7, 8).astype(np.float32))

        g_custom = jax.grad(lambda t: jnp.sum(embedding_lookup(t, ids) * w))(table)
        g_ref = jax.grad(lambda t: jnp.sum(t[ids] * w))(table)
        # bf16 one-hot matmul accumulated in f32: equal to ~1e-2 relative
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_ref), rtol=1e-2, atol=1e-2
        )
        # rows never indexed get exactly zero grad
        used = set(np.asarray(ids).ravel().tolist())
        for v in range(16):
            if v not in used:
                np.testing.assert_array_equal(np.asarray(g_custom[v]), 0.0)

    def test_duplicate_ids_accumulate(self):
        table = jnp.zeros((4, 2))
        ids = jnp.asarray([0, 0, 0])
        g = jax.grad(lambda t: jnp.sum(embedding_lookup(t, ids)))(table)
        np.testing.assert_allclose(np.asarray(g[0]), 3.0)
