"""Amazon Reviews (P5 preprocessed) pipeline.

Reference parity: /root/reference/data/amazon.py
- parses `sequential_data.txt` (one line per user: "uid item1 item2 ...",
  ids 1-based -> remapped to 0-based)                    (amazon.py:62-97)
- leave-two-out protocol: items[:-2] train, items[-2] eval target,
  items[-1] test target — our npz stores the FULL history per user and
  SeqDataset derives the splits positionally              (amazon.py:73-93)
- item text "Title: ...; Brand: ...; Categories: ...; Price: ...;" from
  `meta.json.gz` + `datamaps.json`, encoded with sentence-T5
                                                          (amazon.py:100-150)
- seeded 5% item holdout                                  (amazon.py:154-156)

The P5 zip download needs network access (amazon.py:29-30); in hermetic
environments place the extracted files under {root}/raw/{split}/ manually.

Output: {root}/processed/data.npz in the framework layout (see
data/synthetic.py docstring).

CLI: python -m rqvae_tpu.data.amazon <root> [--split beauty] [--encoder auto]
"""

from __future__ import annotations

import gzip
import json
import os
from typing import List

import numpy as np

from rqvae_tpu.data.preprocessing import encode_text_features
from rqvae_tpu.data.synthetic import save

GDRIVE_ID = "1qGxgmx7G_WB7JE4Cn_bEcZ_o_NAJLE3G"  # P5_data.zip (amazon.py:29)


def _parse_meta(path: str) -> List[dict]:
    out = []
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            # P5 metadata lines are python-literal dicts (reference uses
            # eval(); we use ast.literal_eval for safety)
            import ast

            out.append(ast.literal_eval(line.strip()))
    return out


def _item_sentence(meta: dict) -> str:
    title = str(meta.get("title", ""))
    brand = str(meta.get("brand", "Unknown") or "Unknown")
    cats = meta.get("categories") or [[]]
    cat = str(cats[0]) if cats else "[]"
    price = str(meta.get("price", ""))
    return f"Title: {title}; Brand: {brand}; Categories: {cat}; Price: {price}; "


def process_amazon(
    root: str,
    split: str = "beauty",
    encoder: str = "auto",
    eval_item_frac: float = 0.05,
    seed: int = 42,
    download: bool = True,
) -> str:
    raw_dir = os.path.join(root, "raw", split)
    seq_path = os.path.join(raw_dir, "sequential_data.txt")
    maps_path = os.path.join(raw_dir, "datamaps.json")
    meta_path = os.path.join(raw_dir, "meta.json.gz")
    if not all(os.path.exists(p) for p in (seq_path, maps_path, meta_path)):
        # one-command pipeline on networked hosts (reference amazon.py:54-60
        # downloads the P5 zip; the archive extracts to data/{split}/...)
        from rqvae_tpu.data.download import fetch_zip_members

        if not download:
            raise FileNotFoundError(
                f"Missing raw files under {raw_dir} (download=False). Place "
                f"the extracted P5 data (gdrive id {GDRIVE_ID}) under "
                f"{os.path.join(root, 'raw')}/{{split}}/."
            )
        try:
            print(f"downloading P5 data (gdrive {GDRIVE_ID}) ...")
            fetch_zip_members(
                GDRIVE_ID, os.path.join(root, "raw"), "data",
                gdrive=True, archive_name="P5_data.zip",
            )
        except Exception as e:
            raise FileNotFoundError(
                f"Missing raw files under {raw_dir} and auto-download failed "
                f"({e}). On an offline host, place the extracted P5 data "
                f"(gdrive id {GDRIVE_ID}) under {os.path.join(root, 'raw')}/{{split}}/."
            ) from e

    # --- user sequences (full histories; ids remapped 1-based -> 0-based) ---
    user_ids, sequences = [], []
    with open(seq_path) as f:
        for line in f:
            parts = list(map(int, line.strip().split()))
            user_ids.append(parts[0])
            sequences.append([i - 1 for i in parts[1:]])
    max_len = max(len(s) for s in sequences)
    U = len(sequences)
    seq_items = np.full((U, max_len), -1, np.int64)
    seq_lengths = np.zeros(U, np.int64)
    for i, s in enumerate(sequences):
        seq_items[i, : len(s)] = s
        seq_lengths[i] = len(s)

    # --- item features ---
    with open(maps_path) as f:
        data_maps = json.load(f)
    asin2id = {k: int(v) - 1 for k, v in data_maps["item2id"].items()}
    n_items = max(asin2id.values()) + 1

    metas = _parse_meta(meta_path)
    sentences = [""] * n_items
    for m in metas:
        asin = m.get("asin")
        if asin in asin2id:
            sentences[asin2id[asin]] = _item_sentence(m)
    item_features = encode_text_features(sentences, encoder=encoder)

    rng = np.random.RandomState(seed)
    item_is_train = rng.rand(n_items) > eval_item_frac

    from rqvae_tpu.data.registry import DATASET_MAX_SEQ_LEN, RecDataset

    out = {
        "dataset_name": np.asarray("amazon"),
        "dataset_split": np.asarray(split),
        "item_features": item_features.astype(np.float32),
        "item_is_train": item_is_train,
        "item_text": np.asarray(sentences),
        "seq_items": seq_items,
        "seq_lengths": seq_lengths,
        "user_ids": np.asarray(user_ids, np.int64),
        "seq_format": np.str_("leave_two_out"),
        "max_seq_len": np.int64(DATASET_MAX_SEQ_LEN[RecDataset.AMAZON]),
    }
    path = os.path.join(root, "processed", "data.npz")
    save(path, out)
    return path


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root")
    ap.add_argument("--split", default="beauty", choices=["beauty", "sports", "toys"])
    ap.add_argument("--encoder", default="auto", choices=["auto", "st", "hash"])
    args = ap.parse_args()
    print(process_amazon(args.root, split=args.split, encoder=args.encoder))


if __name__ == "__main__":
    main()
