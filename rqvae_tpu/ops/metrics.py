"""Retrieval evaluation metrics: hits@k and NDCG over generated beams.

Reference parity: /root/reference/evaluate/metrics.py (TopKAccumulator).
The hit test is an exact match of the target L-tuple against each of the
top-k generated tuples; rank is the first matching beam; NDCG contribution
is 1 / log2(rank + 2).

The inner reduction is a pure jittable function so it can run on device
inside the eval step; the accumulator just sums host-side floats.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def topk_hit_metrics(actual: jax.Array, top_k: jax.Array, ks: Sequence[int] = (1, 5, 10)):
    """Compute summed hit/NDCG stats for a batch.

    Args:
      actual: [B, L] target semantic-ID tuples.
      top_k:  [B, K, L] generated tuples, ordered best-first.
      ks:     cutoffs.

    Returns dict of scalar sums: {"ndcg": float, "h@k": float...} plus
    "total" = B. Matches evaluate/metrics.py:16-25.
    """
    match = jnp.all(actual[:, None, :] == top_k, axis=-1)  # [B, K]
    found = jnp.any(match, axis=-1)  # [B]
    rank = jnp.argmax(match, axis=-1)  # first matching beam (0 if none; masked by found)
    ndcg = jnp.where(found, 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0), 0.0)
    out = {"ndcg": jnp.sum(ndcg)}
    for k in ks:
        out[f"h@{k}"] = jnp.sum(jnp.logical_and(found, rank < k).astype(jnp.float32))
    out["total"] = jnp.float32(actual.shape[0])
    return out


class TopKAccumulator:
    """Host-side accumulator mirroring evaluate/metrics.py:7-28."""

    def __init__(self, ks: Sequence[int] = (1, 5, 10)):
        self.ks = tuple(ks)
        self.reset()

    def reset(self) -> None:
        self.total = 0.0
        self.metrics: Dict[str, float] = defaultdict(float)

    def accumulate(self, actual, top_k) -> None:
        stats = jax.device_get(topk_hit_metrics(jnp.asarray(actual), jnp.asarray(top_k), self.ks))
        for k, v in stats.items():
            if k == "total":
                self.total += float(v)
            else:
                self.metrics[k] += float(v)

    def reduce(self) -> Dict[str, float]:
        return {k: v / max(self.total, 1.0) for k, v in self.metrics.items()}
