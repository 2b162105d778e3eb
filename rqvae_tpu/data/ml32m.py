"""MovieLens-32M pipeline.

Reference parity: /root/reference/data/ml32m.py
- CSV raw files (movies.csv, ratings.csv)                  (ml32m.py:36-39)
- >=5-occurrence filtering on userId AND movieId, counts on the full
  ratings table                                            (ml32m.py:92)
- item features = sentence-T5 title embeddings + genre one-hots (ml32m.py:71-80)
- user histories via sliding windows window=200, stride=180, 0.8
  timestamp-quantile train split                           (ml32m.py:111-117)
- the reference additionally stores per-event half-star ratings doubled to
  int alongside itemId in each window (ml32m.py:110); our windows carry
  itemId only — the retrieval model consumes no rating signal (the
  reference's own ML decoder path is dead, train_decoder.py:67-68)

Raw files expected at {root}/raw/{movies.csv,ratings.csv}
(https://files.grouplens.org/datasets/movielens/ml-32m.zip).

CLI: python -m rqvae_tpu.data.ml32m <root> [--encoder auto]
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from rqvae_tpu.data.preprocessing import encode_text_features, generate_user_history_windows
from rqvae_tpu.data.synthetic import save

GENRES_32M = [
    "Action", "Adventure", "Animation", "Children", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "IMAX",
    "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
    "(no genres listed)",
]

URL = "https://files.grouplens.org/datasets/movielens/ml-32m.zip"


def process_ml32m(
    root: str,
    encoder: str = "auto",
    window_size: int = 200,
    stride: int = 180,
    eval_item_frac: float = 0.05,
    seed: int = 42,
    download: bool = True,
) -> str:
    raw = os.path.join(root, "raw")
    if not all(os.path.exists(os.path.join(raw, n)) for n in ("movies.csv", "ratings.csv")):
        # one-command pipeline on networked hosts (reference ml32m.py:40-42)
        from rqvae_tpu.data.download import fetch_zip_members

        if not download:
            raise FileNotFoundError(
                f"Missing raw files under {raw} (download=False); download "
                f"{URL} and extract into {raw}/."
            )
        try:
            print(f"downloading {URL} ...")
            fetch_zip_members(URL, raw, "ml-32m", archive_name="ml-32m.zip")
        except Exception as e:
            raise FileNotFoundError(
                f"Missing raw files under {raw} and auto-download failed ({e}). "
                f"On an offline host, download {URL} and extract into {raw}/."
            ) from e

    ratings = pd.read_csv(os.path.join(raw, "ratings.csv"))
    movies = pd.read_csv(os.path.join(raw, "movies.csv"))

    movie_mapping = {mid: i for i, mid in enumerate(movies["movieId"])}

    # >=5-occurrence filters on BOTH userId and movieId, counts taken on
    # the full ratings table (reference ml32m.py:92 via
    # preprocessing._remove_low_occurrence(ratings, ratings,
    # ["userId", "movieId"]))
    user_counts = ratings["userId"].value_counts()
    movie_counts = ratings["movieId"].value_counts()
    ratings = ratings[ratings["userId"].isin(user_counts[user_counts >= 5].index)]
    ratings = ratings[ratings["movieId"].isin(movie_counts[movie_counts >= 5].index)]
    ratings = ratings[ratings["movieId"].isin(movie_mapping)]

    titles = [str(t).split("(")[0].strip() for t in movies["title"]]
    emb = encode_text_features(titles, encoder=encoder)
    genres = np.zeros((len(movies), len(GENRES_32M)), np.float32)
    for i, g in enumerate(movies["genres"]):
        for tok in str(g).split("|"):
            if tok in GENRES_32M:
                genres[i, GENRES_32M.index(tok)] = 1.0
    item_features = np.concatenate([emb.astype(np.float32), genres], axis=1)

    rng = np.random.RandomState(seed)
    item_is_train = rng.rand(len(movies)) > eval_item_frac

    item_idx = ratings["movieId"].map(movie_mapping).to_numpy(np.int64)
    hist = generate_user_history_windows(
        ratings["userId"].to_numpy(np.int64),
        item_idx,
        ratings["timestamp"].to_numpy(np.int64),
        window_size=window_size,
        stride=stride,
        train_split=0.8,
    )

    out = {
        "dataset_name": np.asarray("ml32m"),
        "item_features": item_features,
        "item_is_train": item_is_train,
        "item_text": np.asarray(titles),
        **hist,
    }
    path = os.path.join(root, "processed", "data.npz")
    save(path, out)
    return path


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--encoder", default="auto", choices=["auto", "st", "hash"])
    args = ap.parse_args()
    print(process_ml32m(args.root, encoder=args.encoder))


if __name__ == "__main__":
    main()
