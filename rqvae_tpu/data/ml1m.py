"""MovieLens-1M pipeline.

Reference parity: /root/reference/data/ml1m.py
- "::"-separated movies/users/ratings files, ISO-8859-1   (ml1m.py:22-46)
- >=5-interaction filtering on movies and users           (ml1m.py:44,76)
- item features = sentence-T5 title embeddings (title truncated before the
  "(" year suffix) concatenated with genre one-hots — the one-hots are the
  trailing categorical features the RQ-VAE's categorical reconstruction
  loss consumes (vae_n_cat_feats=18)                       (ml1m.py:45-57)
- user histories via sliding windows (window=200, stride=1) with the 0.8
  timestamp-quantile train split                           (ml1m.py:104-108)

Raw files expected at {root}/raw/{movies,users,ratings}.dat.

CLI: python -m rqvae_tpu.data.ml1m <root> [--encoder auto] [--stride 1]
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from rqvae_tpu.data.preprocessing import (
    encode_text_features,
    generate_user_history_windows,
    remove_low_occurrence_ids,
)
from rqvae_tpu.data.synthetic import save

GENRES_1M = [
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
]

URL = "https://files.grouplens.org/datasets/movielens/ml-1m.zip"


def process_ml1m(
    root: str,
    encoder: str = "auto",
    stride: int = 1,
    max_seq_len: int = 200,
    eval_item_frac: float = 0.05,
    seed: int = 42,
    download: bool = True,
) -> str:
    raw = os.path.join(root, "raw")
    if not all(os.path.exists(os.path.join(raw, n)) for n in ("movies.dat", "ratings.dat")):
        # one-command pipeline on networked hosts (the reference delegates
        # to torch_geometric.datasets.MovieLens1M's grouplens download)
        from rqvae_tpu.data.download import fetch_zip_members

        if not download:
            raise FileNotFoundError(
                f"Missing raw files under {raw} (download=False); download "
                f"{URL} and extract into {raw}/."
            )
        try:
            print(f"downloading {URL} ...")
            fetch_zip_members(URL, raw, "ml-1m", archive_name="ml-1m.zip")
        except Exception as e:
            raise FileNotFoundError(
                f"Missing raw files under {raw} and auto-download failed ({e}). "
                f"On an offline host, download {URL} and extract into {raw}/."
            ) from e

    ratings = pd.read_csv(
        os.path.join(raw, "ratings.dat"),
        sep="::",
        header=None,
        names=["userId", "movieId", "rating", "timestamp"],
        encoding="ISO-8859-1",
        engine="python",
    )
    movies = pd.read_csv(
        os.path.join(raw, "movies.dat"),
        sep="::",
        header=None,
        names=["movieId", "title", "genres"],
        encoding="ISO-8859-1",
        engine="python",
    )

    # user demographics (reference ml1m.py:59-82): [age_idx, gender, occ_idx]
    # per user surviving the >=5-rating filter on the RAW ratings. Dummies
    # over STR values, so occupation index order is lexicographic ("10"<"2"),
    # exactly as the reference's str.get_dummies().argmax.
    user_features = user_feature_ids = None
    users_path = os.path.join(raw, "users.dat")
    if os.path.exists(users_path):
        users = pd.read_csv(
            users_path, sep="::", header=None,
            names=["userId", "gender", "age", "occupation", "zip"],
            dtype="str", encoding="ISO-8859-1", engine="python",
        )
        uc = ratings["userId"].value_counts()
        keep_u = users["userId"].astype(np.int64).isin(uc[uc >= 5].index)
        udf = users[keep_u]
        age = pd.get_dummies(udf["age"]).values.argmax(axis=1)
        gender = pd.get_dummies(udf["gender"]).values[:, 0]
        occupation = pd.get_dummies(udf["occupation"]).values.argmax(axis=1)
        user_features = np.stack([age, gender, occupation], axis=1).astype(np.float32)
        user_feature_ids = udf["userId"].astype(np.int64).to_numpy()

    # >=5-occurrence filtering (movies then users), reference ml1m.py:44,76
    keep_movies = movies["movieId"].isin(
        ratings["movieId"].value_counts()[lambda s: s >= 5].index
    )
    movies = movies[keep_movies].reset_index(drop=True)
    movie_mapping = {mid: i for i, mid in enumerate(movies["movieId"])}

    keep = remove_low_occurrence_ids(ratings["userId"].to_numpy(), 5) & ratings[
        "movieId"
    ].isin(movie_mapping).to_numpy()
    ratings = ratings[keep]

    # item features: title embedding + genre one-hots (trailing cat feats)
    titles = [t.split("(")[0].strip() for t in movies["title"]]
    emb = encode_text_features(titles, encoder=encoder)
    genres = np.zeros((len(movies), len(GENRES_1M)), np.float32)
    for i, g in enumerate(movies["genres"]):
        for tok in str(g).split("|"):
            if tok in GENRES_1M:
                genres[i, GENRES_1M.index(tok)] = 1.0
    item_features = np.concatenate([emb.astype(np.float32), genres], axis=1)

    rng = np.random.RandomState(seed)
    item_is_train = rng.rand(len(movies)) > eval_item_frac

    item_idx = ratings["movieId"].map(movie_mapping).to_numpy(np.int64)
    hist = generate_user_history_windows(
        ratings["userId"].to_numpy(np.int64),
        item_idx,
        ratings["timestamp"].to_numpy(np.int64),
        window_size=max_seq_len,
        stride=stride,
        train_split=0.8,
    )

    out = {
        "dataset_name": np.asarray("ml1m"),
        "item_features": item_features,
        "item_is_train": item_is_train,
        "item_text": np.asarray(titles),
        **hist,
    }
    if user_features is not None:
        out["user_features"] = user_features
        out["user_feature_ids"] = user_feature_ids
    path = os.path.join(root, "processed", "data.npz")
    save(path, out)
    return path


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--encoder", default="auto", choices=["auto", "st", "hash"])
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()
    print(process_ml1m(args.root, encoder=args.encoder, stride=args.stride))


if __name__ == "__main__":
    main()
