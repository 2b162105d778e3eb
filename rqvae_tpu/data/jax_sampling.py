"""On-device sequence batch sampling (jit-compatible twin of
datasets.SeqDataset's numpy sampling).

The host loop in the reference (and in our numpy path) samples windows and
gathers features per step; at TPU step rates that host work dominates the
wall clock. These functions reproduce the exact window semantics
(reference data/processed.py:137-150) in jnp so the whole
sample -> tokenize -> train pipeline fuses into one XLA program:

  train window: over seq = items[:L-1] (leave-two-out; whole row for
  windows format), start ~ U[0, M-3], end ~ U[start+3, start+ml+1] clamped
  to M; history = window[:-1] right-padded with -1, target = window[-1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def subsample_windows_from_draws(
    u_start: jax.Array,  # [B] uniform [0,1) draws
    u_end: jax.Array,  # [B]
    seq_items: jax.Array,
    seq_lengths: jax.Array,
    row_idx: jax.Array,
    max_seq_len: int,
    leave_two_out: bool = True,
):
    """Window sampling from pre-drawn uniforms. Lets callers batch ALL RNG
    outside a lax.scan (per-step threefry inside a scan dominates the
    fused train step's cost)."""
    ml = max_seq_len
    L = seq_lengths[row_idx]
    M = jnp.maximum(L - 1 if leave_two_out else L, 1)
    # python random.randint is inclusive both ends: start in [0, M-3]
    starts = jnp.floor(u_start * jnp.maximum(1, M - 2)).astype(jnp.int32)
    ends = jnp.minimum(starts + 3 + jnp.floor(u_end * (ml - 1)).astype(jnp.int32), M)
    n = ends - starts

    grid = starts[:, None] + jnp.arange(ml)[None, :]
    ids = seq_items[row_idx[:, None], jnp.minimum(grid, seq_items.shape[1] - 1)]
    mask = jnp.arange(ml)[None, :] < (n - 1)[:, None]
    hist = jnp.where(mask, ids, -1)
    fut = seq_items[row_idx, starts + n - 1]
    return hist, fut


@partial(jax.jit, static_argnames=("max_seq_len", "leave_two_out"))
def subsample_windows(
    key: jax.Array,
    seq_items: jax.Array,  # [R, T] -1 padded
    seq_lengths: jax.Array,  # [R]
    row_idx: jax.Array,  # [B]
    max_seq_len: int,
    leave_two_out: bool = True,
):
    """Returns (hist [B, max_seq_len] -1 padded, fut [B])."""
    k_start, k_end = jax.random.split(key)
    B = row_idx.shape[0]
    u_start = jax.random.uniform(k_start, (B,))
    u_end = jax.random.uniform(k_end, (B,))
    return subsample_windows_from_draws(
        u_start, u_end, seq_items, seq_lengths, row_idx, max_seq_len, leave_two_out
    )


@partial(jax.jit, static_argnames=("max_seq_len",))
def eval_windows(
    seq_items: jax.Array,
    seq_lengths: jax.Array,
    row_idx: jax.Array,
    hist_end: jax.Array,  # [B] exclusive end position (target index)
    max_seq_len: int,
):
    """Deterministic last-ml window before hist_end, target at hist_end."""
    ml = max_seq_len
    starts = jnp.maximum(0, hist_end - ml)
    n = hist_end - starts
    grid = starts[:, None] + jnp.arange(ml)[None, :]
    ids = seq_items[row_idx[:, None], jnp.minimum(grid, seq_items.shape[1] - 1)]
    mask = jnp.arange(ml)[None, :] < n[:, None]
    hist = jnp.where(mask, ids, -1)
    fut = seq_items[row_idx, hist_end]
    return hist, fut
