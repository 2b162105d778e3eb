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


def _mixin_config_to_rqvae(cfg_raw: dict):
    """Reference PyTorchModelHubMixin config.json (the RqVae init kwargs,
    reference modules/rqvae.py:38-51) -> our RqVaeConfig. The mixin JSON-
    encodes `codebook_mode` loosely (enum repr / bare name / value / dict),
    so accept all of them."""
    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVaeConfig

    def _mode(m):
        if m is None:
            return QuantizeForwardMode.GUMBEL_SOFTMAX
        if isinstance(m, QuantizeForwardMode):
            return m
        if isinstance(m, int):
            return QuantizeForwardMode(m)
        if isinstance(m, dict):  # some mixin versions: {"name": ..} / enum dump
            m = m.get("name", m.get("value"))
            return _mode(m)
        name = str(m).split(".")[-1].upper()
        return QuantizeForwardMode[name]

    return RqVaeConfig(
        input_dim=cfg_raw.get("input_dim", 768),
        embed_dim=cfg_raw.get("embed_dim", 32),
        hidden_dims=tuple(cfg_raw.get("hidden_dims", (512, 256, 128))),
        codebook_size=cfg_raw.get("codebook_size", 256),
        n_layers=cfg_raw.get("n_layers", 3),
        commitment_weight=cfg_raw.get("commitment_weight", 0.25),
        n_cat_feats=cfg_raw.get("n_cat_features", 0),
        codebook_normalize=cfg_raw.get("codebook_normalize", False),
        sim_vq=cfg_raw.get("codebook_sim_vq", False),
        codebook_mode=_mode(cfg_raw.get("codebook_mode")),
    )


def _load_torch_state_file(path: str) -> dict:
    """Read a torch state dict from .safetensors or a torch.save file."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # either a bare state_dict or the reference trainer dict {"model": ...}
    return obj["model"] if isinstance(obj, dict) and "model" in obj else obj


def from_pretrained(repo_id_or_dir: str, revision: str | None = None) -> Tuple[Any, Any]:
    """Load (config, params) from a local directory OR a HF Hub repo id —
    the reference-parity entry point for `RqVae.from_pretrained(...)`
    (PyTorchModelHubMixin, reference modules/rqvae.py:37; published mirror
    edobotta/rqvae-amazon-beauty, reference README.md:15).

    Resolution order inside the directory / downloaded snapshot:
      1. our native export (config.json with __dataclass__ + flax msgpack);
      2. PyTorchModelHubMixin layout (config.json = RqVae init kwargs +
         model.safetensors / pytorch_model.bin) — converted via
         utils/torch_import (transpose Linears, stack codebooks);
      3. a raw reference trainer `.pt` (torch.save{model, model_config}).

    Offline (no network) with a repo id degrades with a clear error; local
    directories never touch the network. Returns raw nested param dicts —
    pass them through flax serialization with a template if exact dtypes
    matter (they are numpy arrays, directly usable by model.apply)."""
    path = repo_id_or_dir
    if not os.path.isdir(path):
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise RuntimeError("huggingface_hub is not installed") from e
        try:
            path = snapshot_download(repo_id_or_dir, revision=revision)
        except Exception as e:
            raise RuntimeError(
                f"'{repo_id_or_dir}' is not a local directory and downloading "
                f"it from the HF Hub failed ({type(e).__name__}: {e}). "
                "Offline environments can load a pre-downloaded snapshot "
                "directory instead."
            ) from e

    cfg_file = os.path.join(path, CONFIG_NAME)
    native = os.path.join(path, WEIGHTS_NAME)
    if os.path.exists(native):
        return load_pretrained(path)

    cfg_raw = None
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg_raw = json.load(f)
        if isinstance(cfg_raw, dict) and "__dataclass__" in cfg_raw:
            # native config but missing weights — fall through to error
            cfg_raw = None

    # PyTorchModelHubMixin weight files, preferred order
    for name in ("model.safetensors", "pytorch_model.bin"):
        wfile = os.path.join(path, name)
        if os.path.exists(wfile) and cfg_raw is not None:
            from rqvae_tpu.utils.torch_import import rqvae_params_from_torch_state

            cfg = _mixin_config_to_rqvae(cfg_raw)
            state = _load_torch_state_file(wfile)
            state = {
                k.replace("_orig_mod.", "").replace("module.", ""): v
                for k, v in state.items()
            }
            return cfg, rqvae_params_from_torch_state(state, cfg.n_layers)

    # raw reference trainer checkpoints (*.pt)
    pts = sorted(f for f in os.listdir(path) if f.endswith(".pt"))
    if pts:
        from rqvae_tpu.utils.torch_import import load_reference_rqvae_checkpoint

        cfg, params, _ = load_reference_rqvae_checkpoint(os.path.join(path, pts[-1]))
        return cfg, params

    raise FileNotFoundError(
        f"no loadable model found under {path}: expected {WEIGHTS_NAME}, "
        "model.safetensors / pytorch_model.bin (+ config.json), or a "
        "reference trainer .pt checkpoint"
    )


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
