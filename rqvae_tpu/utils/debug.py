"""Debug mode: NaN guards and finite-checks.

Reference equivalent (SURVEY.md §5.2): the reference has no sanitizers; in
JAX the functional-purity model removes data races entirely, and numeric
debugging is jax_debug_nans plus explicit finite assertions on metric
pytrees (used by the trainers when RQVAE_TPU_DEBUG=1).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("RQVAE_TPU_DEBUG", "0") not in ("0", "", "false")


def enable_nan_checks(enable: bool = True) -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises at the
    op that produced it (with a de-optimized re-run for a precise trace)."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree, context: str = "") -> None:
    """Host-side finite check over a metric/param pytree."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(f"non-finite values in {context}:{name}")


def maybe_init_debug() -> None:
    """Called by trainers at startup; honors RQVAE_TPU_DEBUG=1."""
    if debug_enabled():
        enable_nan_checks(True)
