"""Miniature RAW-format dataset fixtures (the files the reference's
downloaders would fetch): P5 Amazon (sequential_data.txt / datamaps.json /
meta.json.gz, reference data/amazon.py:54-75), ML-1M .dat files
(reference data/ml1m.py:24-44), ML-32M CSVs (reference data/ml32m.py:55-66).

Shared by test_pipelines.py (pipeline units) and test_parity_run.py (the
one-command raw -> npz -> stage-1 -> stage-2 -> eval-JSON chain).
"""

import gzip
import json
import os

import numpy as np

AMAZON_SEQS = [
    [1, 2, 3, 4, 5, 6],
    [2, 3, 4, 5, 6, 7],
    [3, 4, 5, 6, 7, 8],
    [1, 3, 5, 7, 2, 4, 6],
    [8, 7, 6, 5, 4, 3],
    [1, 2, 4, 8, 3, 5],
]


def write_amazon_raw(root: str, split: str = "beauty") -> str:
    """6 users x 8 items in the P5 raw layout under <root>/raw/<split>."""
    raw = os.path.join(root, "raw", split)
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, "sequential_data.txt"), "w") as f:
        for u, s in enumerate(AMAZON_SEQS, 1):
            f.write(" ".join(map(str, [u] + s)) + "\n")
    with open(os.path.join(raw, "datamaps.json"), "w") as f:
        json.dump({"item2id": {f"ASIN{i}": str(i) for i in range(1, 9)}}, f)
    with gzip.open(os.path.join(raw, "meta.json.gz"), "wt") as f:
        for i in range(1, 9):
            f.write(
                repr(
                    {
                        "asin": f"ASIN{i}",
                        "title": f"Product {i}",
                        "brand": f"Brand{i % 3}",
                        "categories": [["Beauty", f"Sub{i}"]],
                        "price": 9.99 + i,
                    }
                )
                + "\n"
            )
    return root


def write_ml1m_raw(root: str) -> str:
    """6 users x 10 movies in the ML-1M ::-delimited layout under <root>/raw."""
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(raw, "movies.dat"), "w", encoding="ISO-8859-1") as f:
        for m in range(1, 11):
            f.write(f"{m}::Movie {m} (199{m % 10})::Comedy|Drama\n")
    with open(os.path.join(raw, "ratings.dat"), "w") as f:
        for u in range(1, 7):
            # each user rates 8 movies over time
            for t, m in enumerate(rng.permutation(10)[:8] + 1):
                f.write(f"{u}::{m}::4::{u * 1000 + t}\n")
    with open(os.path.join(raw, "users.dat"), "w", encoding="ISO-8859-1") as f:
        # userId::gender::age::occupation::zip (reference ml1m.py USER_HEADERS)
        ages = ["1", "18", "25", "35", "45", "50"]
        occs = ["0", "10", "2", "15", "4", "20"]
        for u in range(1, 7):
            f.write(f"{u}::{'F' if u % 2 else 'M'}::{ages[u - 1]}::{occs[u - 1]}::12345\n")
    return root


def write_ml32m_raw(root: str) -> str:
    """6 users x 10 movies in the ML-32M CSV layout under <root>/raw."""
    import pandas as pd

    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)
    movies = pd.DataFrame(
        {
            "movieId": range(1, 11),
            "title": [f"Film {m} (200{m % 10})" for m in range(1, 11)],
            "genres": ["Action|Sci-Fi"] * 10,
        }
    )
    movies.to_csv(os.path.join(raw, "movies.csv"), index=False)
    rng = np.random.RandomState(1)
    rows = []
    for u in range(1, 7):
        for t, m in enumerate(rng.permutation(10)[:8] + 1):
            rows.append({"userId": u, "movieId": m, "rating": 3.5, "timestamp": u * 1000 + t})
    pd.DataFrame(rows).to_csv(os.path.join(raw, "ratings.csv"), index=False)
    return root
