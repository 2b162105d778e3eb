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
