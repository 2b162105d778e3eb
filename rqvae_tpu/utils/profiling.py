"""Tracing / profiling harness.

Reference equivalent (SURVEY.md §5.1): the reference relies on
torch.compile + tlparse log inspection; the TPU-native counterparts are
jax.profiler trace capture (viewable in XProf/TensorBoard) and a
block_until_ready timing harness with compile-time separation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace: `with trace("/tmp/jax-trace"): step(...)`.
    Open with XProf / TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, warmup: int = 1, runs: int = 10, **kwargs) -> Dict[str, float]:
    """Time a jitted callable, separating compile (first call) from
    steady-state. Returns seconds per call + the compile time."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_and_first = time.perf_counter() - t0

    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))

    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / runs
    return {
        "first_call_s": compile_and_first,
        "steady_state_s": per_call,
        "calls_per_sec": 1.0 / per_call if per_call > 0 else float("inf"),
    }


def annotate(name: str):
    """Named profiler region: `with annotate("tokenize"): ...` — shows up
    in the captured trace timeline."""
    return jax.profiler.TraceAnnotation(name)
