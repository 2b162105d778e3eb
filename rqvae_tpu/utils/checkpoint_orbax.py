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
    import jax

    meta = {
        "config": _config_to_jsonable(config),
        "step": int(step),
        "has_opt_state": opt_state is not None,
    }
    # Multi-host: exactly one writer for the (shared-filesystem) meta file,
    # and a barrier so no process can race ahead to restore before the meta
    # is committed (ckptr.save itself already coordinates the array commit).
    if jax.process_index() == 0:
        with open(os.path.join(path, "rqvae_meta.json"), "w") as f:
            json.dump(meta, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"rqvae_orbax_meta_commit_{step}")
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
    has_opt = bool(meta.get("has_opt_state", True))
    target: Optional[dict] = None
    if params_template is not None and (opt_state_template is not None or not has_opt):
        target = {"params": params_template}
        if opt_state_template is not None:
            target["opt_state"] = opt_state_template
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            try:
                restored = ckptr.restore(path, target)
            except ValueError:
                # template/on-disk structure mismatch (e.g. checkpoint saved
                # with opt_state, params-only template): raw-restore + relay
                target = None
                restored = ckptr.restore(path)
        else:
            restored = ckptr.restore(path)
    if target is None and params_template is not None:
        # partial restore (params template only, checkpoint also has
        # opt_state): raw-restore then re-lay the params out onto the
        # template's shardings — supports resuming on a different topology
        import jax
        import jax.numpy as jnp

        def relay(t, v):
            v = jnp.asarray(v)
            if hasattr(t, "sharding"):
                return jax.device_put(v, t.sharding)
            return v

        restored = dict(restored)
        restored["params"] = jax.tree_util.tree_map(
            relay, params_template, restored["params"]
        )
    out = dict(restored)
    out["step"] = int(meta["step"])
    out["config"] = _jsonable_to_config(meta.get("config"))
    return out
