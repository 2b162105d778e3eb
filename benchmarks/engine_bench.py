"""Shape-bucketed serving cost vs pad-to-max (serving/engine.py).

Measures the device beam cost at each item bucket's shape (amortized
fold-proof harness, batch 64), then prices a realistic request-length mix
two ways:

  pad-to-max — every request runs at the largest shape (what a
               single-shape server does);
  bucketed   — each request runs at its RetrievalEngine bucket.

The length mix is lognormal (median ~20 items, sigma 1.0), clipped to
[1, max_items] — long-tailed like real user histories (most users short,
a heavy tail at the 200-item ML-32M window cap).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/engine_bench.py [--max 200]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from rqvae_tpu.serving.engine import _default_item_buckets
from beam_amortized import run_beam

BATCH = 64


def main():
    max_items = 200
    if "--max" in sys.argv:
        max_items = int(sys.argv[sys.argv.index("--max") + 1])
    buckets = _default_item_buckets(max_items)

    costs = {}
    for b in buckets:
        res = run_beam("auto", batch_size=BATCH, n_items=b, r=20, reps=3)
        costs[b] = res["ms_per_batch"]

    rng = np.random.RandomState(0)
    lengths = np.clip(
        np.exp(rng.normal(np.log(20), 1.0, size=100_000)).astype(int), 1, max_items
    )
    assign = np.array([next(b for b in buckets if n <= b) for n in lengths])

    per_req_bucketed = float(np.mean([costs[b] / BATCH for b in assign]))
    per_req_max = costs[buckets[-1]] / BATCH

    print(f"\nbucket costs (ms/batch of {BATCH}):")
    for b in buckets:
        share = float(np.mean(assign == b))
        print(f"  items<={b:4d}: {costs[b]:7.3f} ms  ({share*100:4.1f}% of requests)")
    print(f"pad-to-max per-request device cost: {per_req_max*1e3:.1f} us "
          f"({BATCH/costs[buckets[-1]]*1000:.0f} QPS)")
    print(f"bucketed    per-request device cost: {per_req_bucketed*1e3:.1f} us "
          f"({1/per_req_bucketed*1000:.0f} QPS)")
    print(f"bucketing speedup on this mix: {per_req_max/per_req_bucketed:.2f}x")


if __name__ == "__main__":
    main()
