"""Async micro-batching front end for TPU serving.

The reference has no serving layer at all (generate() only runs inside its
eval loop, /root/reference/train_decoder.py:221-246); this module is
beyond-parity surface like serving/engine.py, which it wraps. It closes
the last gap between "a batch API" and "a service": production traffic
arrives one request at a time, but a TPU only earns its throughput when
queries share a dispatch (RESULTS.md: 20.3k QPS at B=64 vs ~1/RTT for
singleton batches through a remoted runtime).

`AsyncRetrievalEngine.submit()` returns a `concurrent.futures.Future`
immediately; a single worker thread coalesces queued requests and flushes
them through `RetrievalEngine.retrieve_many` when either

- enough requests are waiting to fill the largest batch bucket, or
- the oldest queued request has waited `max_delay_ms` (tail-latency bound).

One worker thread is the right concurrency: a single-chip XLA dispatch
queue serializes programs anyway, and `RetrievalEngine` already splits a
flush into per-(batch, items)-bucket programs, so the worker's only job is
deciding WHEN to cut a batch. All request/response bookkeeping is
host-side numpy; results are per-request slices of the engine's stacked
output, so a submit()ed request returns exactly what `retrieve_many`
would return for it (locked by tests/test_queue.py).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Optional

import jax
import numpy as np

from rqvae_tpu.serving.engine import RetrievalEngine


class AsyncRetrievalEngine:
    """Micro-batching request queue over a `RetrievalEngine`.

    Args:
      engine: the shape-bucketed batch engine to dispatch through.
      max_delay_ms: tail-latency bound — a queued request never waits
        longer than this for co-batching before a flush is forced.
      autostart: start the worker thread immediately. Tests (and callers
        that want deterministic batching) can pass False and call
        `flush()` manually.
    """

    def __init__(
        self,
        engine: RetrievalEngine,
        max_delay_ms: float = 5.0,
        autostart: bool = True,
    ):
        self.engine = engine
        self.max_delay = max_delay_ms / 1000.0
        self._cap = engine.batch_buckets[-1]
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._pending: list = []  # (history, user_id, Future)
        self._oldest: Optional[float] = None  # enqueue time of _pending[0]
        self._shutdown = False
        self._worker: Optional[threading.Thread] = None
        # observability
        self.flushes = 0
        self.requests = 0
        # end-to-end latency (enqueue -> future resolved) of the most
        # recent requests, seconds; bounded so long-running services don't
        # grow memory. Read through stats().
        self._latencies: deque = deque(maxlen=16384)
        self._batch_sizes: deque = deque(maxlen=16384)
        if autostart:
            self.start()

    # ---- lifecycle ----

    def start(self) -> None:
        if self._worker is None or not self._worker.is_alive():
            self._shutdown = False
            self._worker = threading.Thread(
                target=self._run, name="rqvae-serving-queue", daemon=True
            )
            self._worker.start()

    def close(self) -> None:
        """Drain the queue, then stop the worker."""
        with self._cond:
            self._shutdown = True
            self._cond.notify_all()
        if self._worker is not None and self._worker.is_alive():
            self._worker.join()
        # a close() without a worker (autostart=False) still drains
        self.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- submission ----

    def submit(self, history, user_id: int = 0) -> Future:
        """Enqueue one request (1-D item-id history). Returns a Future
        resolving to a per-request RetrievalResult (arrays of shape [k],
        [k, L], [k]) — identical to that request's row out of
        `RetrievalEngine.retrieve_many`."""
        h = np.asarray(history, np.int32)
        assert h.ndim == 1, "submit() takes a single 1-D history"
        fut: Future = Future()
        with self._cond:
            if self._shutdown:
                raise RuntimeError("AsyncRetrievalEngine is closed")
            now = time.monotonic()
            if not self._pending:
                self._oldest = now
            self._pending.append((h, int(user_id), fut, now))
            self.requests += 1
            self._cond.notify_all()
        return fut

    # ---- batching / dispatch ----

    def _take_batch(self) -> list:
        """Under the lock: pop up to `cap` requests (callers decide when)."""
        batch = self._pending[: self._cap]
        self._pending = self._pending[self._cap :]
        self._oldest = time.monotonic() if self._pending else None
        return batch

    def _dispatch(self, batch: list) -> None:
        """Run one flush through the engine and resolve its futures."""
        if not batch:
            return
        self.flushes += 1
        with self._lock:  # stats() iterates these deques under the lock
            self._batch_sizes.append(len(batch))
        hists = [b[0] for b in batch]
        uids = [b[1] for b in batch]
        futs = [b[2] for b in batch]
        try:
            res = self.engine.retrieve_many(hists, uids)
        except Exception as e:  # resolve every waiter, never deadlock
            for f in futs:
                if not f.done():
                    f.set_exception(e)
            return
        for i, f in enumerate(futs):
            f.set_result(jax.tree_util.tree_map(lambda a, i=i: np.asarray(a)[i], res))
        done = time.monotonic()
        with self._lock:
            self._latencies.extend(done - b[3] for b in batch)

    def stats(self) -> dict:
        """Service-level observability over the most recent requests:
        end-to-end latency percentiles (enqueue -> result, seconds) and
        dispatch batch-size distribution. Thread-safe snapshot."""
        with self._lock:
            lats = np.asarray(self._latencies, np.float64)
            sizes = np.asarray(self._batch_sizes, np.float64)
        out = {"requests": self.requests, "flushes": self.flushes}
        if lats.size:
            p50, p95, p99 = np.percentile(lats, [50, 95, 99])
            out.update(latency_p50_s=float(p50), latency_p95_s=float(p95),
                       latency_p99_s=float(p99), latency_mean_s=float(lats.mean()))
        if sizes.size:
            out.update(batch_size_mean=float(sizes.mean()),
                       batch_size_max=int(sizes.max()))
        return out

    def flush(self) -> int:
        """Synchronously dispatch everything currently queued (manual mode
        or final drain). Returns the number of requests served."""
        served = 0
        while True:
            with self._cond:
                if not self._pending:
                    return served
                batch = self._take_batch()
            served += len(batch)
            self._dispatch(batch)

    def _run(self) -> None:
        while True:
            with self._cond:
                while not self._pending and not self._shutdown:
                    self._cond.wait()
                if self._shutdown:
                    break
                # batch is full -> cut now; otherwise wait out the oldest
                # request's delay budget, waking early if the cap fills.
                # Re-check `self._pending` each wake: a concurrent manual
                # flush() may have drained the queue (then _oldest is None).
                while (
                    self._pending
                    and len(self._pending) < self._cap
                    and not self._shutdown
                    and (left := self._oldest + self.max_delay - time.monotonic()) > 0
                ):
                    self._cond.wait(timeout=left)
                batch = self._take_batch()
            self._dispatch(batch)
        self.flush()  # drain whatever arrived before close()
