"""HF-Hub-style model export / import.

Reference parity: the reference RqVae carries PyTorchModelHubMixin
(rqvae.py:37) and the decoder trainer can push the trained tokenizer to the
Hub (train_decoder.py:127-129). Here a model exports to a self-describing
directory (config.json + flax msgpack weights) that can be loaded locally
or pushed with huggingface_hub when network access exists.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
from flax import serialization

from rqvae_tpu.utils.checkpoint import _config_to_jsonable, _jsonable_to_config

WEIGHTS_NAME = "flax_model.msgpack"
CONFIG_NAME = "config.json"


def save_pretrained(save_dir: str, params: Any, config: Any) -> str:
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, CONFIG_NAME), "w") as f:
        json.dump(_config_to_jsonable(config), f, indent=2)
    with open(os.path.join(save_dir, WEIGHTS_NAME), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    return save_dir


def load_pretrained(save_dir: str, params_template: Any = None) -> Tuple[Any, Any]:
    """Returns (config, params). With a template, restores exact pytree
    structure/dtypes; without, returns raw nested dicts."""
    with open(os.path.join(save_dir, CONFIG_NAME)) as f:
        config = _jsonable_to_config(json.load(f))
    with open(os.path.join(save_dir, WEIGHTS_NAME), "rb") as f:
        blob = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    return config, params


def push_to_hub(save_dir: str, repo_id: str, private: bool = True) -> str:
    """Upload an exported directory to the HF Hub (requires network +
    huggingface_hub login; degrades with a clear error otherwise)."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise RuntimeError("huggingface_hub is not installed") from e
    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=save_dir, repo_id=repo_id)
    return f"https://huggingface.co/{repo_id}"
