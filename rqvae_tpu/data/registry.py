"""Dataset registry.

Reference parity: /root/reference/data/processed.py:18-36 (RecDataset enum
and the per-dataset max sequence lengths). Adds SYNTHETIC for hermetic
end-to-end runs.
"""

from __future__ import annotations

import enum
import os


class RecDataset(enum.Enum):
    AMAZON = 1
    ML_1M = 2
    ML_32M = 3
    SYNTHETIC = 4


DATASET_MAX_SEQ_LEN = {
    RecDataset.AMAZON: 20,
    RecDataset.ML_1M: 200,
    RecDataset.ML_32M: 200,
    RecDataset.SYNTHETIC: None,  # taken from the generated file
}


def ensure_dataset(root: str, dataset: RecDataset, split: str | None = None, force: bool = False) -> dict:
    """Load (and if necessary produce) the processed npz for a dataset.

    SYNTHETIC auto-generates on first use. Real datasets must have been
    preprocessed by their pipeline CLIs (rqvae_tpu.data.amazon / ml1m /
    ml32m) — network downloads cannot run in hermetic environments.
    """
    from rqvae_tpu.data.datasets import load_processed

    path = os.path.join(root, "processed", "data.npz")
    if force or not os.path.exists(path):
        if dataset == RecDataset.SYNTHETIC:
            from rqvae_tpu.data.synthetic import generate_and_save

            generate_and_save(root)
        elif dataset == RecDataset.AMAZON:
            from rqvae_tpu.data.amazon import process_amazon

            process_amazon(root, split=split or "beauty")
        elif dataset == RecDataset.ML_1M:
            from rqvae_tpu.data.ml1m import process_ml1m

            process_ml1m(root)
        elif dataset == RecDataset.ML_32M:
            from rqvae_tpu.data.ml32m import process_ml32m

            process_ml32m(root)
        else:
            raise ValueError(f"Unknown dataset {dataset}")
    data = load_processed(root)
    _check_stamp(data, dataset, split, root)
    return data


_STAMPS = {
    RecDataset.AMAZON: "amazon",
    RecDataset.ML_1M: "ml1m",
    RecDataset.ML_32M: "ml32m",
    RecDataset.SYNTHETIC: "synthetic",
}


def _check_stamp(data: dict, dataset: RecDataset, split: str | None, root: str) -> None:
    """Refuse to train on a pre-existing npz produced for a DIFFERENT
    dataset or Amazon split at the same root (each pipeline stamps
    dataset_name/dataset_split into the file; unstamped legacy files pass)."""
    name = str(data["dataset_name"]) if "dataset_name" in data else None
    want = _STAMPS[dataset]
    if name is not None and name != want:
        raise ValueError(
            f"{root}/processed/data.npz was produced by the '{name}' pipeline "
            f"but dataset={want} was requested; use a different dataset_folder "
            "or force=True to reprocess"
        )
    if dataset == RecDataset.AMAZON and split and "dataset_split" in data:
        have = str(data["dataset_split"])
        if have != split:
            raise ValueError(
                f"{root}/processed/data.npz holds the Amazon '{have}' split "
                f"but split='{split}' was requested; use a different "
                "dataset_folder or force=True to reprocess"
            )
