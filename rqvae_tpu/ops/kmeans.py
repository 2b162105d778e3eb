"""Batched Lloyd's K-means for codebook initialization, fully jitted.

Reference parity: /root/reference/init/kmeans.py — random-choice centroid
init (kmeans.py:33-37), pairwise L2 assignment (kmeans.py:39-46),
empty-cluster re-seeding from a random point (kmeans.py:50-56), convergence
when the max centroid movement < 1e-10 (kmeans.py:65-69).

TPU-first differences:
- The unbounded `while` becomes `lax.while_loop` with a hard iteration cap
  (static shapes, single compiled program).
- The per-cluster Python loop becomes a one-hot matmul segment-mean (MXU).
- Randomness is explicit-key (reseeds use fold_in(key, iteration)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KmeansOutput(NamedTuple):
    centroids: jax.Array  # [k, D]
    assignment: jax.Array  # [B]
    iterations: jax.Array  # [] int32, Lloyd iterations actually run


def _pairwise_sq_dists(x: jax.Array, c: jax.Array) -> jax.Array:
    """[B, k] squared L2 distances via the matmul expansion (MXU-friendly)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)
    return x2 + c2[None, :] - 2.0 * (x @ c.T)


def _kmeanspp_init(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (Arthur & Vassilvitskii 2007): each next centroid is
    a data point sampled with probability proportional to its squared
    distance from the closest centroid chosen so far. Improves on the
    reference's plain random choice (kmeans.py:33-37) — fewer local optima."""
    B, _ = x.shape
    k0, kl = jax.random.split(key)
    idx0 = jax.random.randint(k0, (), 0, B)
    c0 = x[idx0]
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(c0)
    mind = jnp.sum((x - c0) ** 2, axis=-1)

    def body(i, state):
        centroids, mind = state
        ki = jax.random.fold_in(kl, i)
        idx = jax.random.categorical(ki, jnp.log(jnp.maximum(mind, 1e-30)))
        c = x[idx]
        centroids = centroids.at[i].set(c)
        mind = jnp.minimum(mind, jnp.sum((x - c) ** 2, axis=-1))
        return centroids, mind

    centroids, _ = jax.lax.fori_loop(1, k, body, (centroids, mind))
    return centroids


@partial(jax.jit, static_argnames=("k", "max_iters", "init"))
def kmeans(
    key: jax.Array,
    x: jax.Array,
    k: int,
    max_iters: int = 100,
    stop_threshold: float = 1e-10,
    init: str = "kmeans++",
) -> KmeansOutput:
    """Run Lloyd's algorithm on `x` [B, D] with `k` clusters.

    init="kmeans++" (default) uses D^2-weighted seeding; init="random"
    matches the reference's distinct-point random choice (kmeans.py:33-37).
    Empty clusters are reseeded with a random data point each iteration.
    """
    B, D = x.shape
    x = x.astype(jnp.float32)
    init_key, loop_key = jax.random.split(key)
    if init == "kmeans++":
        centroids0 = _kmeanspp_init(init_key, x, k)
    else:
        init_idx = jax.random.permutation(init_key, B)[:k]
        centroids0 = x[init_idx]

    def assign(c):
        d = _pairwise_sq_dists(x, c)
        return jnp.argmin(d, axis=-1)

    def update(c, it):
        a = assign(c)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)  # [B, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = onehot.T @ x  # [k, D]
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty-cluster reseed: random data point (reference kmeans.py:50-56).
        rk = jax.random.fold_in(loop_key, it)
        rand_idx = jax.random.randint(rk, (k,), 0, B)
        reseed = x[rand_idx]
        new_c = jnp.where((counts > 0)[:, None], means, reseed)
        return new_c, a

    def cond(state):
        _, _, moved, it = state
        return jnp.logical_and(moved >= stop_threshold, it < max_iters)

    def body(state):
        c, _, _, it = state
        new_c, a = update(c, it)
        moved = jnp.max(jnp.linalg.norm(new_c - c, axis=-1))
        return new_c, a, moved, it + 1

    state0 = (centroids0, assign(centroids0), jnp.inf, jnp.int32(0))
    c, a, _, it = jax.lax.while_loop(cond, body, state0)
    return KmeansOutput(centroids=c, assignment=a, iterations=it)
