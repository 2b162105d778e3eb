"""Multi-host initialization and process gating.

Replaces Accelerate's process management (reference train_rqvae.py:67-70,
212-216, 258): `jax.distributed.initialize()` for multi-host SPMD, and
`is_main_process()` for I/O gating (checkpoints, logging). Barriers are
unnecessary — jitted collectives synchronize devices, and host-side
checkpoint writes are process-local.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime
    (no-op single-host). Safe to call multiple times."""
    global _initialized
    if _initialized:
        return
    # Only initialize when a coordinator is configured; plain single-host
    # runs (including tests) skip this entirely.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    _initialized = True


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
