"""Corpus prefix trie (sorted packed-key tables) for constrained decoding.

Reference parity: /root/reference/modules/model.py:169-182
(_check_valid_prefix) masks beam candidates whose semantic-ID prefix does
not exist in the corpus, via an exhaustive [N_corpus, B*k*n] equality
broadcast per level — O(N * candidates). Here each corpus tuple prefix is
packed into an integer key (level 0 in the most-significant bits, see
ops/dedup.pack_sem_id_tuples) and sorted once at index-build time; validity
is then a binary search (jnp.searchsorted) — O(log N) per candidate and
fully vectorized on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rqvae_tpu.ops.dedup import id_bits, pack_sem_id_tuples


class PrefixTable(NamedTuple):
    """Per-level prefix validity tables; a pytree, so it can be closed
    over / passed through jit.

    Each level is EITHER a dense bool bitmap indexed by packed prefix key
    (one gather per lookup; used when K^(h+1) <= dense_limit) OR a sorted
    int key array (binary search; O(log N) gather rounds). The two are
    distinguished by dtype, keeping the pytree structure uniform."""

    level_keys: Tuple[jax.Array, ...]  # bool [K^(h+1)] bitmap or sorted int [N]
    bits: int  # bits per level in the packing


def build_prefix_table(
    corpus_ids: jax.Array,
    codebook_size: int,
    dense_limit: int = 1 << 26,  # 64M bools = 64MB; covers 256^3
) -> PrefixTable:
    """corpus_ids: [N, L] (dedup column already stripped)."""
    L = corpus_ids.shape[1]
    bits = id_bits(codebook_size)
    tables = []
    for h in range(L):
        keys = pack_sem_id_tuples(corpus_ids[:, : h + 1], codebook_size)
        size = 1 << (bits * (h + 1))
        if size <= dense_limit:
            tables.append(jnp.zeros((size,), bool).at[keys].set(True))
        else:
            tables.append(jnp.sort(keys))
    return PrefixTable(level_keys=tuple(tables), bits=bits)


def is_valid_prefix(table: PrefixTable, level: int, keys: jax.Array) -> jax.Array:
    """keys: packed prefixes of length level+1, any shape -> bool mask."""
    t = table.level_keys[level]
    if t.dtype == jnp.bool_:
        return t[keys]
    idx = jnp.searchsorted(t, keys, side="left")
    idx = jnp.clip(idx, 0, t.shape[0] - 1)
    return t[idx] == keys


def extend_keys(table: PrefixTable, parent_keys: jax.Array, candidate_ids: jax.Array) -> jax.Array:
    """parent prefix keys [..] extended with one more level's ids [..]."""
    return (parent_keys << table.bits) | candidate_ids.astype(parent_keys.dtype)
