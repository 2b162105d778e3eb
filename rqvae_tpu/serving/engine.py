"""Shape-bucketed request batching for TPU serving.

XLA compiles one program per input shape. A serving front end that passes
raw request shapes straight through therefore recompiles on every new
(batch, history-length) combination — and the alternative, padding every
request to the global maximum, makes a 3-item history pay the full
800-token encoder (the encoder is ~70% of a long-row beam batch,
RESULTS.md round 3). The TPU-idiomatic middle ground is a small static
set of shape buckets:

- each request's item history is padded up to the next ITEM bucket
  (-1 padding; masked positions are exact no-ops — locked by
  tests/test_engine.py against the unpadded program);
- requests are grouped per bucket and stacked, the group batch is padded
  up to the next BATCH bucket with empty rows (discarded on return);
- every (batch_bucket, item_bucket) pair maps to one cached XLA program,
  so steady-state serving never compiles.

The reference has no serving layer (generate() is only called from its
eval loop, /root/reference/train_decoder.py:221-246, at the fixed eval
batch shape); this subsystem is beyond-parity surface, like
serving/retriever.py which it wraps.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from rqvae_tpu.serving.retriever import RetrievalResult, Retriever


def _default_item_buckets(max_items: int) -> tuple:
    """Powers of two up to max_items, always including max_items itself."""
    buckets = []
    b = 8
    while b < max_items:
        buckets.append(b)
        b *= 2
    buckets.append(max_items)
    return tuple(buckets)


class RetrievalEngine:
    """Batched, shape-bucketed front end over `Retriever`.

    `max_items` is the longest history (in items) the engine serves;
    longer histories keep their most recent `max_items` items (the
    reference's windowing keeps the most recent context too,
    /root/reference/data/processed.py:32-36).
    """

    def __init__(
        self,
        retriever: Retriever,
        max_items: int,
        item_buckets: Optional[Sequence[int]] = None,
        batch_buckets: Sequence[int] = (1, 4, 16, 64),
    ):
        self.retriever = retriever
        self.max_items = int(max_items)
        self.item_buckets = tuple(
            sorted(item_buckets) if item_buckets else _default_item_buckets(self.max_items)
        )
        assert self.item_buckets[-1] >= self.max_items, "largest item bucket must cover max_items"
        # a mesh-sharded Retriever needs every batch shape to divide the
        # mesh axis (shard_map divisibility): round buckets up to multiples
        m = getattr(retriever, "batch_multiple", 1)
        self.batch_buckets = tuple(sorted({max(-(-b // m) * m, m) for b in batch_buckets}))
        # observability: how many batches ran at each (batch, items) shape
        self.shape_counts: dict = {}

    def _bucket_for(self, n: int, buckets: tuple) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def _run_group_device(self, hists, uids, item_bucket):
        """Dispatch one bucket-shaped program; returns DEVICE results (the
        full padded batch — callers slice after the host fetch)."""
        n = len(hists)
        bb = self._bucket_for(n, self.batch_buckets)
        padded = np.full((bb, item_bucket), -1, np.int32)
        users = np.zeros((bb,), np.int32)
        for i, h in enumerate(hists):
            padded[i, : len(h)] = h
            users[i] = uids[i]
        self.shape_counts[(bb, item_bucket)] = self.shape_counts.get((bb, item_bucket), 0) + 1
        res = self.retriever.retrieve(padded, users)
        # Start the device->host transfers NOW, while the program still
        # runs: on remoted runtimes a blocking np.asarray is a full
        # transport round trip, and finalize_many fetches 3 leaves per
        # bucket group — serially that was the measured ~170 QPS sustained
        # ceiling of the whole serving queue (benchmarks/transport_micro.py,
        # slo_bench.py). Async copies put every leaf's transfer in flight
        # concurrently so the fetch drains in ~1 RTT.
        for leaf in jax.tree_util.tree_leaves(res):
            copy = getattr(leaf, "copy_to_host_async", None)
            if copy is not None:
                copy()
        return res

    def _run_group(self, hists, uids, item_bucket):
        """hists: list of 1-D int arrays (each <= item_bucket items)."""
        res = self._run_group_device(hists, uids, item_bucket)
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[: len(hists)], res)

    def retrieve_many_device(
        self,
        histories: Sequence[np.ndarray],  # per-request 1-D item-id arrays
        user_ids: Optional[Sequence[int]] = None,
    ) -> list:
        """DISPATCH phase of retrieve_many: bucket the requests, enqueue one
        program per (batch, items) bucket group, and return a plan of
        (request_indices, device_result) pairs WITHOUT fetching values.
        Pass the plan to `finalize_many` to produce the stacked host result.

        The split lets the async queue (serving/queue.py) overlap the NEXT
        flush's dispatch with this one's host fetch — on remoted runtimes
        the fetch is transport-round-trip-bound, not device-bound, and a
        single worker doing dispatch+fetch serially was the measured
        sustained-QPS ceiling (benchmarks/slo_bench.py, RESULTS r4)."""
        if user_ids is None:
            user_ids = [0] * len(histories)
        assert len(user_ids) == len(histories)
        # truncate to the most recent max_items, drop explicit pad markers
        cleaned = []
        for h in histories:
            h = np.asarray(h, np.int32)
            h = h[h >= 0]
            cleaned.append(h[-self.max_items :])

        groups: dict = {}
        for i, h in enumerate(cleaned):
            b = self._bucket_for(max(len(h), 1), self.item_buckets)
            groups.setdefault(b, []).append(i)

        plan = []
        for item_bucket, idxs in sorted(groups.items()):
            # split oversize groups at the largest batch bucket
            cap = self.batch_buckets[-1]
            for s in range(0, len(idxs), cap):
                chunk = idxs[s : s + cap]
                res = self._run_group_device(
                    [cleaned[i] for i in chunk], [user_ids[i] for i in chunk], item_bucket
                )
                plan.append((chunk, res))
        return plan

    @staticmethod
    def finalize_many(n_requests: int, plan: list) -> RetrievalResult:
        """FETCH phase: pull each group's device result to the host and
        stack per-request rows in request order."""
        out = [None] * n_requests
        for chunk, res in plan:
            host = jax.tree_util.tree_map(np.asarray, res)
            for j, i in enumerate(chunk):
                out[i] = jax.tree_util.tree_map(lambda a, j=j: a[j], host)
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *out)

    def retrieve_many(
        self,
        histories: Sequence[np.ndarray],
        user_ids: Optional[Sequence[int]] = None,
    ) -> RetrievalResult:
        """Serve a list of variable-length requests; results stack in
        request order."""
        return self.finalize_many(
            len(histories), self.retrieve_many_device(histories, user_ids)
        )

    def warmup(self) -> int:
        """Compile every (batch, items) bucket pair upfront (optional —
        serving systems pay compiles at deploy time, not on live traffic).
        Returns the number of programs warmed."""
        n = 0
        for ib in self.item_buckets:
            for bb in self.batch_buckets:
                dummy = np.full((bb, ib), -1, np.int32)
                dummy[:, 0] = 0  # one valid item per row
                self.retriever.retrieve(dummy, np.zeros((bb,), np.int32))
                n += 1
        return n
