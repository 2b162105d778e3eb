"""The head-to-head harness (benchmarks/ref_headtohead.py) feeds the
REFERENCE model numpy-tokenized batches via `_tokenize_np`, a mirror of
our tokenizer/semids.py::_tokenize_from_cache — the quality comparison is
apples-to-apples only if the mirror is exact. Pin it: same table, same
SeqBatch => identical sem_ids / sem_ids_fut / seq_mask, including -1
history padding and empty-history rows."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import SeqBatch
from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

def _load_h2h():
    """Load the harness module lazily (inside the test, not at collection
    time): its top level mutates process state (sys.path insert, env var),
    and any future heavy top-level import added there would otherwise load
    into every suite run (ADVICE r4)."""
    spec = importlib.util.spec_from_file_location(
        "ref_headtohead",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks", "ref_headtohead.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tokenize_np_matches_tokenizer_lookup():
    _h2h = _load_h2h()
    rng = np.random.RandomState(0)
    N, D, B, Nseq = 50, 4, 7, 5
    table = rng.randint(0, 32, (N, D)).astype(np.int64)

    ids = rng.randint(0, N, (B, Nseq)).astype(np.int64)
    lengths = rng.randint(0, Nseq + 1, B)
    lengths[0] = 0  # empty history row
    lengths[1] = Nseq  # full row
    mask = np.arange(Nseq)[None, :] < lengths[:, None]
    ids = np.where(mask, ids, -1)
    ids_fut = rng.randint(0, N, B).astype(np.int64)

    sb = SeqBatch(
        user_ids=np.arange(B), ids=ids, ids_fut=ids_fut,
        x=np.zeros((B, 0, 0), np.float32), x_fut=np.zeros((B, 0), np.float32),
        seq_mask=mask,
    )

    sem_np, fut_np, mask_np = _h2h._tokenize_np(table, sb)
    tb = _tokenize_from_cache(
        jnp.asarray(table), jnp.asarray(sb.user_ids), jnp.asarray(ids),
        jnp.asarray(ids_fut), jnp.asarray(mask),
    )

    np.testing.assert_array_equal(sem_np, np.asarray(tb.sem_ids))
    np.testing.assert_array_equal(fut_np, np.asarray(tb.sem_ids_fut))
    np.testing.assert_array_equal(mask_np, np.asarray(tb.seq_mask))
