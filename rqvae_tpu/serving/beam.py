"""Corpus prefix trie (row-bitmap / sorted packed-key tables) for
constrained decoding.

Reference parity: /root/reference/modules/model.py:169-182
(_check_valid_prefix) masks beam candidates whose semantic-ID prefix does
not exist in the corpus, via an exhaustive [N_corpus, B*k*n] equality
broadcast per level — O(N * candidates). Here each corpus tuple prefix is
packed into an integer key (level 0 in the most-significant bits, see
ops/dedup.pack_sem_id_tuples) and looked up in O(1)/O(log N).

TPU layout note: dense levels store the bitmap 2-D as [K^h, 2^bits] —
parent prefix key indexes the ROW, child id the column — because beam
search always asks "which children of these B*k parents are valid?" and
the children of one parent are one contiguous row. A row gather of B*k
rows is ~40x faster on TPU than B*k*K scattered single-bool gathers from
the flat bitmap (benchmarks/score_phases.py: one score stage 3.0 -> 0.08
ms at B=64, k=10, K=256, level 2): scattered 1-element gathers from a
16MB HBM table lower to serialized transactions, while a trailing-
contiguous row gather rides the fast embedding-lookup path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rqvae_tpu.ops.dedup import id_bits, pack_sem_id_tuples


@jax.tree_util.register_pytree_node_class
class PrefixTable:
    """Per-level prefix validity tables; a registered pytree, so it can be
    closed over / passed through jit — with `bits` as STATIC aux data (it
    sizes `arange(2^bits)` in the sorted-key lookup, so it must stay a
    Python int when the table is a jit/shard_map argument, as in
    serving/retriever.py's recompile-free extension path).

    Each level is EITHER a dense bool row-bitmap [K^h, 2^bits] indexed by
    (parent key, child id) (used when K^(h+1) <= dense_limit) OR a sorted
    int key array of packed length-(h+1) prefixes (binary search). The two
    are distinguished by dtype, keeping the pytree structure uniform."""

    __slots__ = ("level_keys", "bits")

    def __init__(self, level_keys: Tuple[jax.Array, ...], bits: int):
        self.level_keys = tuple(level_keys)  # bool [K^h, 2^bits] / sorted int [N]
        self.bits = bits  # bits per level in the packing (static)

    def tree_flatten(self):
        return self.level_keys, self.bits

    @classmethod
    def tree_unflatten(cls, bits, level_keys):
        return cls(tuple(level_keys), bits)


def _sentinel(dtype) -> int:
    """Pad value for sorted-key levels under `capacity`: the dtype max sorts
    after every valid key and can never equal one (valid packed prefixes
    are < 2^(bits*(h+1)) <= dtype max — asserted in build_prefix_table)."""
    return int(jnp.iinfo(dtype).max)


def build_prefix_table(
    corpus_ids: jax.Array,
    codebook_size: int,
    dense_limit: int = 1 << 26,  # 64M bools = 64MB; covers 256^3
    capacity: int | None = None,
) -> PrefixTable:
    """corpus_ids: [N, L] (dedup column already stripped).

    `capacity` (>= N) pads sorted-key levels with a sentinel so the table
    keeps a STATIC shape while the corpus grows via extend_prefix_table —
    live item admission without recompiling the serving program. Dense
    row-bitmap levels are already corpus-size-independent ([K^h, 2^bits]).
    """
    N, L = corpus_ids.shape
    bits = id_bits(codebook_size)
    W = 1 << bits
    cap = N if capacity is None else int(capacity)
    assert cap >= N, f"capacity {cap} < corpus size {N}"
    tables = []
    for h in range(L):
        keys = pack_sem_id_tuples(corpus_ids[:, : h + 1], codebook_size)
        size = 1 << (bits * (h + 1))
        if size <= dense_limit:
            flat = jnp.zeros((size,), bool).at[keys].set(True)
            tables.append(flat.reshape(size // W, W))
        else:
            if cap > N:
                # sentinel must be unreachable by valid keys
                assert bits * (h + 1) < jnp.iinfo(keys.dtype).bits - 1, (
                    "capacity padding needs headroom above the key space"
                )
                keys = jnp.concatenate(
                    [keys, jnp.full((cap - N,), _sentinel(keys.dtype), keys.dtype)]
                )
            tables.append(jnp.sort(keys))
    return PrefixTable(level_keys=tuple(tables), bits=bits)


def extend_prefix_table(
    table: PrefixTable,
    new_corpus_ids: jax.Array,  # [M, L] semantic ids of the admitted items
    codebook_size: int,
    n_valid_old: int,  # corpus size BEFORE this extension (python int)
) -> PrefixTable:
    """Admit M new corpus tuples into the trie without changing any array
    shape (the serving program stays compiled). Dense levels OR the new
    (parent row, child column) bits in; sorted levels overwrite sentinel
    slots [n_valid_old, n_valid_old+M) and re-sort. Requires the table to
    have been built with `capacity >= n_valid_old + M`."""
    M, L = new_corpus_ids.shape
    assert L == len(table.level_keys)
    W = 1 << table.bits
    out = []
    for h, t in enumerate(table.level_keys):
        keys = pack_sem_id_tuples(new_corpus_ids[:, : h + 1], codebook_size)
        if t.dtype == jnp.bool_:
            out.append(t.at[keys >> table.bits, keys & (W - 1)].set(True))
        else:
            assert n_valid_old + M <= t.shape[0], (
                f"prefix-table capacity {t.shape[0]} exceeded: "
                f"{n_valid_old} + {M} items"
            )
            out.append(jnp.sort(t.at[n_valid_old : n_valid_old + M].set(jnp.sort(keys))))
    return PrefixTable(level_keys=tuple(out), bits=table.bits)


def is_valid_prefix(table: PrefixTable, level: int, keys: jax.Array) -> jax.Array:
    """keys: packed prefixes of length level+1, any shape -> bool mask.

    Scattered per-key lookup; prefer valid_children() in beam search (the
    row-gather form) — see the module docstring's TPU layout note."""
    t = table.level_keys[level]
    if t.dtype == jnp.bool_:
        return t[keys >> table.bits, keys & ((1 << table.bits) - 1)]
    idx = jnp.searchsorted(t, keys, side="left")
    idx = jnp.clip(idx, 0, t.shape[0] - 1)
    return t[idx] == keys


def valid_children(table: PrefixTable, level: int, parent_keys: jax.Array) -> jax.Array:
    """Validity of ALL 2^bits child extensions of each parent prefix.

    parent_keys: packed length-`level` prefixes, any shape [..] (zeros for
    level 0, where every beam shares the empty prefix). Returns bool
    [.., 2^bits]; columns >= codebook_size (non-power-of-two K) are never
    set by build_prefix_table, so they read False."""
    t = table.level_keys[level]
    if t.dtype == jnp.bool_:
        return t[parent_keys]
    W = 1 << table.bits
    child = jnp.arange(W, dtype=t.dtype)
    keys = (parent_keys[..., None].astype(t.dtype) << table.bits) | child
    idx = jnp.clip(jnp.searchsorted(t, keys, side="left"), 0, t.shape[0] - 1)
    return t[idx] == keys


def extend_keys(table: PrefixTable, parent_keys: jax.Array, candidate_ids: jax.Array) -> jax.Array:
    """parent prefix keys [..] extended with one more level's ids [..]."""
    return (parent_keys << table.bits) | candidate_ids.astype(parent_keys.dtype)
