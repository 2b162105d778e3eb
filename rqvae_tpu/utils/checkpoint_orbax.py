"""Orbax checkpoint backend: multi-host-safe, async-capable, sharded saves.

The default backend (utils/checkpoint.py) writes single msgpack files —
right-sized for these models (<15M params) and loadable anywhere. For
multi-host / large-model deployments Orbax adds atomic directory commits,
per-shard writes (OCDBT), and async save; this module offers the same
{step, params, opt_state, config} contract on top of
orbax.checkpoint.StandardCheckpointer (SURVEY.md §5.3's "Orbax-style"
recovery note).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from rqvae_tpu.utils.checkpoint import _config_to_jsonable, _jsonable_to_config


def save_checkpoint_orbax(
    save_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    config: Any = None,
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(save_dir, f"checkpoint_{step}"))
    os.makedirs(save_dir, exist_ok=True)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    meta = {"config": _config_to_jsonable(config), "step": int(step)}
    with open(os.path.join(path, "rqvae_meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint_orbax(
    path: str,
    params_template: Any = None,
    opt_state_template: Any = None,
) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "rqvae_meta.json")) as f:
        meta = json.load(f)
    target: Optional[dict] = None
    if params_template is not None:
        target = {"params": params_template}
        if opt_state_template is not None:
            target["opt_state"] = opt_state_template
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target) if target is not None else ckptr.restore(path)
    out = dict(restored)
    out["step"] = int(meta["step"])
    out["config"] = _jsonable_to_config(meta.get("config"))
    return out
