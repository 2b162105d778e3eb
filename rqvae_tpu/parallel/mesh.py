"""Device mesh construction and sharding helpers.

Replaces the reference's HF Accelerate substrate (SURVEY.md §2.4): instead
of DDP wrappers and NCCL all-reduces, we build a `jax.sharding.Mesh` with
('data', 'model') axes, annotate batch/param shardings, and let GSPMD
insert the collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh. Defaults to all devices on the
    data axis — the reference's only parallelism is DP (SURVEY.md §2.4)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    dev_array = np.array(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dimension over the 'data' axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch, batch_axis: int = 0):
    """Place every leaf with its batch dim sharded over 'data'."""
    sh = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(np.asarray(a), sh), batch)


def replicate_pytree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def commit_scalars(mesh: Mesh, tree):
    """Re-commit 0-d leaves to the mesh (replicated), leaving other leaves'
    shardings untouched. Checkpoint restores commit scalar leaves (e.g. the
    optimizer step count) to a single device; jit then rejects mixing them
    with mesh-sharded params. Run this over a restored state before
    resuming on a mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh) if getattr(a, "ndim", None) == 0 else a, tree
    )


def global_batch_from_process_local(mesh: Mesh, batch, batch_axis: int = 0):
    """Multi-host batch assembly: each process holds its local slice of the
    global batch; builds the global jax.Array sharded over 'data'
    (the GSPMD equivalent of Accelerate's per-process batch sharding,
    reference train_rqvae.py:67-70). Single-process: plain device_put."""
    sh = batch_sharding(mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda a: jax.device_put(np.asarray(a), sh), batch)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)), batch
    )
