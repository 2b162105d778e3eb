"""Serving engine tests: shape bucketing must be invisible to results.

The engine pads histories to item buckets and batches to batch buckets;
padding is masked, so a padded run must reproduce the unpadded program's
beams (same sem_ids / items; log-probas to float tolerance — longer
padded shapes reassociate reductions)."""

import numpy as np

from rqvae_tpu.serving.engine import RetrievalEngine, _default_item_buckets
from rqvae_tpu.serving.retriever import Retriever

from tests.test_retriever import _setup


def _mk(max_items=8, batch_buckets=(1, 2, 4)):
    data, model, params, tok, hist = _setup()
    r = Retriever(model, params, tok)
    return r, RetrievalEngine(r, max_items=max_items, batch_buckets=batch_buckets), hist


class TestBuckets:
    def test_default_item_buckets(self):
        assert _default_item_buckets(8) == (8,)
        assert _default_item_buckets(20) == (8, 16, 20)
        assert _default_item_buckets(200) == (8, 16, 32, 64, 128, 200)

    def test_bucket_rounding(self):
        _, eng, _ = _mk(max_items=20)
        assert eng.item_buckets == (8, 16, 20)
        assert eng._bucket_for(3, eng.item_buckets) == 8
        assert eng._bucket_for(9, eng.item_buckets) == 16
        assert eng._bucket_for(17, eng.item_buckets) == 20


class TestEngineExactness:
    def test_bucketed_equals_direct(self):
        """Each request's engine result == the direct Retriever result at
        the request's own padded shape."""
        r, eng, hist = _mk(max_items=8, batch_buckets=(1, 2, 4))
        # variable-length requests sliced out of the fixture histories
        requests = [hist[0][:3], hist[1][:8], hist[2][:5], hist[3][:2], hist[4][:8]]
        out = eng.retrieve_many(requests)
        assert out.item_ids.shape == (5, 5)
        for i, h in enumerate(requests):
            h = np.asarray(h, np.int32)
            h = h[h >= 0]
            direct = r.retrieve(h[None, :])
            np.testing.assert_array_equal(out.sem_ids[i], np.asarray(direct.sem_ids)[0])
            np.testing.assert_array_equal(out.item_ids[i], np.asarray(direct.item_ids)[0])
            np.testing.assert_allclose(
                out.log_probas[i], np.asarray(direct.log_probas)[0], rtol=1e-4, atol=1e-5
            )

    def test_batch_padding_rows_are_dropped(self):
        _, eng, hist = _mk(max_items=8, batch_buckets=(4,))
        out = eng.retrieve_many([hist[0][:4]])  # 1 request in a batch-4 program
        assert out.item_ids.shape == (1, 5)
        assert eng.shape_counts == {(4, 8): 1}

    def test_mesh_sharded_engine_rounds_buckets_and_matches_direct(self):
        """Engine over a mesh-sharded Retriever: batch buckets round up to
        mesh-axis multiples (shard_map divisibility) and results still
        equal the plain Retriever's."""
        import jax
        from jax.sharding import Mesh

        data, model, params, tok, hist = _setup()
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        r_plain = Retriever(model, params, tok)
        r_mesh = Retriever(model, params, tok, mesh=mesh)
        eng = RetrievalEngine(r_mesh, max_items=8, batch_buckets=(1, 2, 4))
        assert eng.batch_buckets == (8,)  # rounded up to the mesh size
        requests = [hist[0][:3], hist[1][:8], hist[2][:5]]
        out = eng.retrieve_many(requests)
        assert out.item_ids.shape == (3, 5)
        for i, h in enumerate(requests):
            h = np.asarray(h, np.int32)
            h = h[h >= 0]
            direct = r_plain.retrieve(np.tile(np.pad(h, (0, 8 - len(h)), constant_values=-1)[None, :], (1, 1)))
            np.testing.assert_array_equal(out.sem_ids[i], np.asarray(direct.sem_ids)[0])
            np.testing.assert_array_equal(out.item_ids[i], np.asarray(direct.item_ids)[0])

    def test_truncation_keeps_most_recent(self):
        r, eng, hist = _mk(max_items=4)
        h = np.asarray(hist[1], np.int32)
        h = h[h >= 0]
        assert len(h) >= 6
        out = eng.retrieve_many([h])
        direct = r.retrieve(h[-4:][None, :])
        np.testing.assert_array_equal(out.sem_ids[0], np.asarray(direct.sem_ids)[0])

    def test_grouping_and_order(self):
        """Requests land back in input order even when bucket groups split
        and reorder execution."""
        _, eng, hist = _mk(max_items=8, batch_buckets=(1, 2))
        requests = [hist[i][: (3 if i % 2 else 8)] for i in range(5)]
        out = eng.retrieve_many(requests)
        # re-serve each alone; rows must match positionally
        for i, h in enumerate(requests):
            solo = eng.retrieve_many([h])
            np.testing.assert_array_equal(out.sem_ids[i], solo.sem_ids[0])
        # max_items=8 -> single item bucket; both lengths round to 8
        assert all(shape[1] == 8 for shape in eng.shape_counts)

    def test_warmup_compiles_all_buckets(self):
        _, eng, _ = _mk(max_items=8, batch_buckets=(1, 2))
        assert eng.warmup() == len(eng.item_buckets) * len(eng.batch_buckets)
