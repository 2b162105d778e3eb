"""Host-side batch iteration and device placement.

Reference parity: /root/reference/data/utils.py (cycle / batch_to /
next_batch). TPU-first: batches are numpy pytrees placed onto the device
mesh with an explicit NamedSharding (batch axis over 'data'), which is the
GSPMD equivalent of Accelerate's per-process batch sharding.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np

def infinite_batches(dataset, batch_size: int, seed: int = 0, **kw) -> Iterator:
    """Infinite stream of randomly sampled batches (reference cycle())."""
    rng = np.random.RandomState(seed)
    while True:
        yield dataset.sample_batch(rng, batch_size, **kw)


def to_device(batch, sharding: Optional[jax.sharding.Sharding] = None):
    """Transfer a (possibly nested) numpy batch to device(s).

    With a sharding, uses jax.device_put so each device gets its batch
    shard; the reference equivalent is batch_to(batch, device)
    (data/utils.py:9-11) plus Accelerate's split_batches.
    """
    if sharding is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, batch)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)
