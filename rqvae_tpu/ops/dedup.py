"""Semantic-ID tuple dedup and diversity statistics, sort-based.

Reference semantics (modules/tokenizer/semids.py:92-108): the dedup column
for corpus item i is the number of EARLIER corpus items (j < i) whose full
L-level semantic-ID tuple is identical. The reference computes this with an
O(N^2) pairwise-equality broadcast per 512-item batch; here we pack each
tuple into a single integer key and use one O(N log N) sort — corpus order
is preserved as the sort tiebreaker so counts match exactly.

Also hosts the diversity diagnostics from train_rqvae.py:272-292:
tuple-distribution entropy, per-level codebook usage, max duplicate count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def id_bits(codebook_size: int) -> int:
    """Bits needed per level."""
    return max(1, (int(codebook_size) - 1).bit_length())


def packed_key_space(codebook_size: int, n_levels: int) -> int:
    """Size of the packed-key space: keys use bit-fields, so this is
    1 << (bits * L) (NOT K**L — K=3 packs into 2-bit fields, max key 42)."""
    return 1 << (id_bits(codebook_size) * n_levels)


def pack_sem_id_tuples(sem_ids: jax.Array, codebook_size: int) -> jax.Array:
    """Pack [..., L] tuples of IDs in [0, K) into unique integer keys.

    Level 0 occupies the most-significant bits so key order is lexicographic
    tuple order — which makes the same keys reusable for sorted-prefix
    (trie) lookups in constrained beam search.

    Uses int32 when L * bits <= 31 (the flagship config 3x256 needs 24 bits);
    falls back to int64 when JAX x64 is enabled.
    """
    L = sem_ids.shape[-1]
    bits = id_bits(codebook_size)
    if L * bits <= 31:
        dtype = jnp.int32
    elif L * bits <= 62 and jax.config.jax_enable_x64:
        dtype = jnp.int64
    else:
        raise ValueError(
            f"Cannot pack {L} levels x {bits} bits "
            f"(x64 enabled: {jax.config.jax_enable_x64})"
        )
    ids = sem_ids.astype(dtype)
    # weighted row-sum instead of a per-level shift/or loop: one contiguous
    # multiply + reduce over the (tiny) last axis — the sequential column
    # variant costs ~60ms at N=65k on TPU due to lane-padded column ops
    mults = jnp.asarray([1 << (bits * (L - 1 - l)) for l in range(L)], dtype=dtype)
    return jnp.sum(ids * mults, axis=-1, dtype=dtype)


@jax.jit
def dedup_counts_from_keys(keys: jax.Array) -> jax.Array:
    """dedup[i] = #{j < i : keys[j] == keys[i]} via two fused sorts.

    Forward: one stable two-operand `lax.sort` of (keys, iota) yields the
    sorted keys AND the permutation in a single pass (ties keep corpus
    order). Inverse: instead of scattering rank_in_run back through the
    permutation (`.at[order].set` — XLA-TPU scatters serialize), a SECOND
    `lax.sort` keyed on the permutation carries the ranks home; `order` is
    a permutation so the unstable sort is exact. Measured on v5e at
    N=65,536 (benchmarks/dedup_sort_micro.py, differential-timed):
    0.917 ms argsort+gather+scatter -> 0.179 ms this form; the raw stable
    key+payload sort alone is 0.059 ms, so the remaining overhead is the
    second sort + the (cheap) scan, within ~3x of the sort lower bound.
    """
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_keys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
    idx = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    # Segment start position, propagated forward with a running max.
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank_in_run = (idx - seg_start).astype(jnp.int32)
    _, dedup = jax.lax.sort((order, rank_in_run), num_keys=1, is_stable=False)
    return dedup


@partial(jax.jit, static_argnames=("key_space", "chunk"))
def dedup_counts_dense(keys: jax.Array, key_space: int, chunk: int = 4096) -> jax.Array:
    """Sort-free dedup: dedup[i] = #{j < i : keys[j] == keys[i]} via a dense
    histogram over the packed key space plus in-chunk triangular counts —
    the reference's in-batch-tril + batch-vs-cache decomposition
    (semids.py:95-104) with the growing cache replaced by an O(K^L) table.

    Per chunk: one [c, c] equality compare (VPU), one gather and one
    scatter-add into the histogram. MEASURED SLOWER than the sort at the
    flagship geometry (8.5 ms vs 0.67 ms for 65k keys on v5e — the 16.7M-bin
    histogram scatter dominates); retained as a tested alternative for tiny
    key spaces where the table is cache-resident.
    """
    n = keys.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    # pad with the out-of-range bin so padding never collides with real keys
    keys_p = jnp.full((n_pad,), key_space, keys.dtype).at[:n].set(keys)
    hist = jnp.zeros((key_space + 1,), jnp.int32)
    iota = jnp.arange(chunk)

    def body(hist, kc):
        eq = kc[:, None] == kc[None, :]
        tril = jnp.sum(eq & (iota[None, :] < iota[:, None]), axis=1, dtype=jnp.int32)
        prior = hist[kc]
        hist = hist.at[kc].add(1)
        return hist, prior + tril

    _, counts = jax.lax.scan(body, hist, keys_p.reshape(-1, chunk))
    return counts.reshape(-1)[:n]


def dedup_counts(sem_ids: jax.Array, codebook_size: int) -> jax.Array:
    """[N, L] tuples -> [N] counts of earlier duplicates."""
    return dedup_counts_from_keys(pack_sem_id_tuples(sem_ids, codebook_size))


@jax.jit
def tuple_entropy(keys: jax.Array) -> jax.Array:
    """Entropy of the empirical tuple distribution, -sum p log p.

    Matches train_rqvae.py:278-282 (torch.unique + counts)."""
    n = keys.shape[0]
    sorted_keys = jnp.sort(keys)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    run_id = jnp.cumsum(is_start) - 1
    counts = jax.ops.segment_sum(jnp.ones(n), run_id, num_segments=n)
    p = counts / n
    return -jnp.sum(jnp.where(counts > 0, p * jnp.log(p), 0.0))


@partial(jax.jit, static_argnames=("codebook_size",))
def codebook_usage(sem_ids: jax.Array, codebook_size: int) -> jax.Array:
    """Fraction of codebook entries used per level -> [L].

    Matches train_rqvae.py:284-288."""
    def usage_one(ids_l):
        counts = jnp.bincount(ids_l, length=codebook_size)
        return jnp.mean((counts > 0).astype(jnp.float32))

    return jax.vmap(usage_one, in_axes=1)(sem_ids)
