"""Shared preprocessing ops for the real dataset pipelines.

Reference parity: /root/reference/data/preprocessing.py (PreprocessingMixin)
- >=5-occurrence filtering                       (preprocessing.py:29-37)
- text encoding via sentence-transformers/sentence-t5-xxl, batch 2
                                                 (preprocessing.py:40-49)
- timestamp-quantile ordered train/eval split    (preprocessing.py:52-54)
- sliding-window user-history generation (window/stride) with -1 padding
                                                 (preprocessing.py:77-151)

Differences: numpy/pandas instead of polars/torch; the text encoder is
pluggable — when sentence-transformers (or its model weights) is
unavailable (hermetic environments), a deterministic feature-hashing
encoder stands in so the full pipeline stays testable. Pass
encoder="st" to require the real model.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np


def remove_low_occurrence_ids(ids: np.ndarray, min_count: int = 5) -> np.ndarray:
    """Boolean keep-mask over `ids` rows: keep values occurring >= min_count
    (reference preprocessing.py:29-37)."""
    vals, counts = np.unique(ids, return_counts=True)
    return np.isin(ids, vals[counts >= min_count])


def hashed_text_features(texts: Sequence[str], dim: int = 768) -> np.ndarray:
    """Deterministic stand-in for sentence-T5: token feature hashing with
    signed buckets, L2-normalized. NOT semantically meaningful beyond
    lexical overlap — use only where real embeddings are unavailable."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            h = hashlib.md5(tok.encode()).digest()
            idx = int.from_bytes(h[:4], "little") % dim
            sign = 1.0 if h[4] % 2 == 0 else -1.0
            out[i, idx] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-6)


def encode_text_features(
    texts: Sequence[str],
    encoder: str = "auto",
    model_name: str = "sentence-transformers/sentence-t5-xxl",
    batch_size: int = 2,
    dim: int = 768,
) -> np.ndarray:
    """Encode item text. encoder: "st" (require sentence-transformers),
    "hash" (stand-in), or "auto" (st if loadable, else hash).
    Reference preprocessing.py:40-49 uses sentence-t5-xxl with batch 2."""
    texts = list(texts)
    if encoder in ("st", "auto"):
        try:
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)
            emb = model.encode(
                sentences=texts, batch_size=batch_size, show_progress_bar=True, convert_to_numpy=True
            )
            return np.asarray(emb, np.float32)
        except Exception as e:
            if encoder == "st":
                raise
            print(f"[preprocessing] sentence-transformers unavailable ({type(e).__name__}); "
                  f"falling back to hashed text features")
    return hashed_text_features(texts, dim)


def ordered_train_split(timestamps: np.ndarray, train_split: float = 0.8) -> np.ndarray:
    """is_train mask: timestamp <= quantile(train_split)
    (reference preprocessing.py:52-54)."""
    thr = np.quantile(timestamps, train_split)
    return timestamps <= thr


def generate_user_history_windows(
    user_ids: np.ndarray,
    item_ids: np.ndarray,
    timestamps: np.ndarray,
    window_size: int = 200,
    stride: int = 1,
    train_split: float = 0.8,
):
    """Sliding windows over each user's time-ordered interactions
    (reference preprocessing.py:77-151, polars group_by_dynamic semantics:
    windows start every `stride` rows within a user's sorted rows and span
    up to `window_size` rows).

    Returns dict with windows-format arrays: seq_items [R, window_size]
    (-1 right-padded), seq_lengths [R], user_ids [R], seq_is_train [R]
    (timestamp-quantile split on each window's max timestamp; eval windows
    of length 1 are dropped, mirroring the `is_train | seq_len > 1`
    filter at preprocessing.py:118).
    """
    order = np.lexsort((timestamps, user_ids))
    u, it, ts = user_ids[order], item_ids[order], timestamps[order]

    rows_items: List[np.ndarray] = []
    rows_users: List[int] = []
    rows_maxts: List[float] = []
    start = 0
    n = len(u)
    while start < n:
        end = start
        while end < n and u[end] == u[start]:
            end += 1
        for s in range(start, end, stride):
            e = min(s + window_size, end)
            rows_items.append(it[s:e])
            rows_users.append(int(u[start]))
            rows_maxts.append(float(ts[s:e].max()))
        start = end

    R = len(rows_items)
    seq_items = np.full((R, window_size), -1, np.int64)
    seq_lengths = np.zeros(R, np.int64)
    for i, row in enumerate(rows_items):
        seq_items[i, : len(row)] = row
        seq_lengths[i] = len(row)
    is_train = ordered_train_split(np.asarray(rows_maxts), train_split)

    keep = is_train | (seq_lengths > 1)
    return {
        "seq_items": seq_items[keep],
        "seq_lengths": seq_lengths[keep],
        "user_ids": np.asarray(rows_users, np.int64)[keep],
        "seq_is_train": is_train[keep],
        "seq_format": np.str_("windows"),
        "max_seq_len": np.int64(window_size),
    }
