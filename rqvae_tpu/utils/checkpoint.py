"""Versioned checkpointing: params + optimizer state + step + config + RNG.

Reference parity: torch.save of {iter, model, model_config, optimizer}
(train_rqvae.py:258-270) and {iter, model, optimizer, scheduler}
(train_decoder.py:248-260); resume paths at train_rqvae.py:144-151.

The RQ-VAE checkpoint is the contract between the two training stages
(SURVEY.md §5.4): the decoder trainer rebuilds the RQ-VAE from the stored
config and loads these weights.

Format: a single msgpack file per step (flax.serialization) plus a JSON
config sidecar inside it. Multi-host: call only from the main process
(params are replicated under pure data parallelism).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _config_to_jsonable(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {
            "__dataclass__": type(cfg).__name__,
            **{k: _config_to_jsonable(v) for k, v in dataclasses.asdict(cfg).items()},
        }
    if isinstance(cfg, enum.Enum):
        return {"__enum__": type(cfg).__name__, "name": cfg.name}
    if isinstance(cfg, (list, tuple)):
        return list(cfg)
    return cfg


def _jsonable_to_config(obj: Any) -> Any:
    """Inverse of _config_to_jsonable for the dataclasses we know about."""
    if isinstance(obj, dict) and "__enum__" in obj:
        from rqvae_tpu.utils.config import _ENUM_REGISTRY, _register_builtin_enums

        _register_builtin_enums()
        return _ENUM_REGISTRY[obj["__enum__"]][obj["name"]]
    if isinstance(obj, dict) and "__dataclass__" in obj:
        from rqvae_tpu.models.rqvae import RqVaeConfig

        classes = {"RqVaeConfig": RqVaeConfig}
        try:
            from rqvae_tpu.models.retrieval import RetrievalConfig

            classes["RetrievalConfig"] = RetrievalConfig
        except ImportError:
            pass
        cls = classes[obj["__dataclass__"]]
        kwargs = {
            k: _jsonable_to_config(v)
            for k, v in obj.items()
            if k != "__dataclass__"
        }
        # tuples for fields declared as tuples
        for f in dataclasses.fields(cls):
            if f.name in kwargs and isinstance(kwargs[f.name], list):
                kwargs[f.name] = tuple(kwargs[f.name])
        return cls(**kwargs)
    return obj


def save_checkpoint(
    save_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    config: Any = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write checkpoint_{step}.msgpack under save_dir; returns the path."""
    os.makedirs(save_dir, exist_ok=True)
    payload = {
        "step": np.int64(step),
        "params": jax.device_get(params),
    }
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    if extra:
        payload["extra"] = jax.device_get(extra)
    blob = serialization.to_bytes(payload)
    meta = json.dumps({"config": _config_to_jsonable(config), "step": int(step)}).encode()
    path = os.path.join(save_dir, f"checkpoint_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(len(meta).to_bytes(8, "little"))
        f.write(meta)
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(
    path: str,
    params_template: Any = None,
    opt_state_template: Any = None,
    extra_template: Any = None,
) -> Dict[str, Any]:
    """Load a checkpoint. With templates, restores exact pytree structure
    and dtypes; without, returns raw nested dicts (enough to read config/
    step). Returns {step, params, opt_state?, extra?, config}."""
    with open(path, "rb") as f:
        meta_len = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(meta_len))
        blob = f.read()

    template: Dict[str, Any] = {"step": np.int64(0)}
    if params_template is not None:
        template["params"] = params_template
        if opt_state_template is not None:
            template["opt_state"] = opt_state_template
        if extra_template is not None:
            template["extra"] = extra_template
        payload = serialization.from_bytes(template, blob)
    else:
        payload = serialization.msgpack_restore(blob)

    payload = dict(payload)
    payload["config"] = _jsonable_to_config(meta.get("config"))
    payload["step"] = int(payload["step"])
    return payload


def latest_checkpoint(save_dir: str) -> Optional[str]:
    if not os.path.isdir(save_dir):
        return None
    best: Tuple[int, Optional[str]] = (-1, None)
    for name in os.listdir(save_dir):
        if name.startswith("checkpoint_") and name.endswith(".msgpack"):
            try:
                step = int(name[len("checkpoint_") : -len(".msgpack")])
            except ValueError:
                continue
            if step > best[0]:
                best = (step, os.path.join(save_dir, name))
    return best[1]
