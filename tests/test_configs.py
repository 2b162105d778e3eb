"""Every shipped config must parse and bind cleanly to its trainer — the
reference shipped a stale config (decoder_ml32m.gin) that would fail gin
binding (SURVEY.md §2.3); this test class prevents that here."""

import glob
import inspect
import os

import pytest

from rqvae_tpu.utils.config import parse_config_file

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def _trainer_for(path):
    if "decoder" in os.path.basename(path):
        from rqvae_tpu.train.train_decoder import train
    else:
        from rqvae_tpu.train.train_rqvae import train
    return train


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.gin"))))
def test_config_binds_to_trainer(path):
    bindings = parse_config_file(path)
    assert bindings, f"{path} is empty"
    train = _trainer_for(path)
    params = inspect.signature(train).parameters
    unknown = set(bindings) - set(params)
    assert not unknown, f"{os.path.basename(path)} binds unknown params: {sorted(unknown)}"


# ---- config-surface completeness (VERDICT r4 Next #7) ----
#
# Every RecDataset x stage pair must have a shipped, bind-checked config —
# Amazon expands to its three reference splits (reference data/amazon.py:35).
# Exceptions must be documented here, not silently absent.

_MATRIX = {
    ("rqvae", "AMAZON", "beauty"): "rqvae_amazon.gin",
    ("decoder", "AMAZON", "beauty"): "decoder_amazon.gin",
    ("rqvae", "AMAZON", "sports"): "rqvae_amazon_sports.gin",
    ("decoder", "AMAZON", "sports"): "decoder_amazon_sports.gin",
    ("rqvae", "AMAZON", "toys"): "rqvae_amazon_toys.gin",
    ("decoder", "AMAZON", "toys"): "decoder_amazon_toys.gin",
    ("rqvae", "ML_1M", None): "rqvae_ml1m.gin",
    ("decoder", "ML_1M", None): "decoder_ml1m.gin",
    ("rqvae", "ML_32M", None): "rqvae_ml32m.gin",
    ("decoder", "ML_32M", None): "decoder_ml32m.gin",
    ("rqvae", "SYNTHETIC", None): "rqvae_synthetic.gin",
    ("decoder", "SYNTHETIC", None): "decoder_synthetic.gin",
}


def test_dataset_stage_matrix_complete():
    from rqvae_tpu.data.registry import RecDataset

    # the matrix covers every enum member (so adding a dataset without a
    # config fails here, not in the field)
    covered = {ds for (_, ds, _) in _MATRIX}
    assert covered == {d.name for d in RecDataset}, (
        f"config matrix covers {sorted(covered)} but RecDataset has "
        f"{sorted(d.name for d in RecDataset)}"
    )

    for (stage, ds, split), fname in _MATRIX.items():
        path = os.path.join(CONFIG_DIR, fname)
        assert os.path.exists(path), f"missing config for {stage}/{ds}/{split}: {fname}"
        bindings = parse_config_file(path)
        assert bindings.get("dataset").name == ds, (
            f"{fname} binds dataset={bindings.get('dataset')}, expected {ds}"
        )
        if split is not None:
            assert bindings.get("dataset_split") == split, (
                f"{fname} binds dataset_split={bindings.get('dataset_split')!r}, "
                f"expected {split!r}"
            )
