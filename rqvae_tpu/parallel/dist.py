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
    # Initialize when a coordinator is configured explicitly, OR when the
    # environment carries Cloud TPU pod markers (multi-host slices export
    # worker topology; jax.distributed.initialize() auto-detects the
    # coordinator from TPU metadata there). Plain single-host runs
    # (including tests) skip this entirely. RQVAE_TPU_DISTRIBUTED=1
    # forces it; =0 disables.
    force = os.environ.get("RQVAE_TPU_DISTRIBUTED")
    if force not in (None, "", "0", "1"):
        raise ValueError(
            f"RQVAE_TPU_DISTRIBUTED={force!r}: must be '0' or '1' "
            "(typos would otherwise silently fall through to auto-detection)"
        )
    # TPU_WORKER_HOSTNAMES is set to the single local host on one-host TPU
    # VMs too — it only signals a pod when it lists MULTIPLE workers
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod_markers = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or ("," in workers)
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        # manual launch marker: counts so that NUM_PROCESSES without a
        # coordinator address errors loudly instead of silently running
        # single-process
        or os.environ.get("RQVAE_TPU_NUM_PROCESSES")
    )
    if force != "0" and (force == "1" or pod_markers):
        # Manual launch (no cluster auto-detect): RQVAE_TPU_NUM_PROCESSES +
        # RQVAE_TPU_PROCESS_ID name this process's slot explicitly — the
        # local-coordinator equivalent of `accelerate launch --num_processes`
        # (reference train_rqvae.py:67-70). Cross-process CPU collectives
        # need gloo; the knob is a no-op for TPU backends.
        nproc = os.environ.get("RQVAE_TPU_NUM_PROCESSES")
        if nproc is not None:
            coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
                "COORDINATOR_ADDRESS"
            )
            if not coord:
                raise ValueError(
                    "RQVAE_TPU_NUM_PROCESSES is set but no JAX_COORDINATOR_ADDRESS/"
                    "COORDINATOR_ADDRESS names the coordinator"
                )
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass  # older jaxlibs without the knob: TPU pods don't need it
            pid = os.environ.get("RQVAE_TPU_PROCESS_ID")
            if pid is None:
                raise ValueError(
                    "RQVAE_TPU_NUM_PROCESSES is set but RQVAE_TPU_PROCESS_ID is "
                    "not; each process must name its slot (0..N-1)"
                )
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        else:
            jax.distributed.initialize()
    _initialized = True


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
