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
    """Sorted packed prefix keys per hierarchy level; a pytree, so it can be
    closed over / passed through jit."""

    level_keys: Tuple[jax.Array, ...]  # level h -> sorted [N] keys of ids[:, :h+1]
    bits: int  # bits per level in the packing


def build_prefix_table(corpus_ids: jax.Array, codebook_size: int) -> PrefixTable:
    """corpus_ids: [N, L] (dedup column already stripped)."""
    L = corpus_ids.shape[1]
    keys = []
    for h in range(L):
        keys.append(jnp.sort(pack_sem_id_tuples(corpus_ids[:, : h + 1], codebook_size)))
    return PrefixTable(level_keys=tuple(keys), bits=id_bits(codebook_size))


def is_valid_prefix(table: PrefixTable, level: int, keys: jax.Array) -> jax.Array:
    """keys: packed prefixes of length level+1, any shape -> bool mask."""
    sorted_keys = table.level_keys[level]
    idx = jnp.searchsorted(sorted_keys, keys, side="left")
    idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
    return sorted_keys[idx] == keys


def extend_keys(table: PrefixTable, parent_keys: jax.Array, candidate_ids: jax.Array) -> jax.Array:
    """parent prefix keys [..] extended with one more level's ids [..]."""
    return (parent_keys << table.bits) | candidate_ids.astype(parent_keys.dtype)
