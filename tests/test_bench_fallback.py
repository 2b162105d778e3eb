"""bench.py's wedged-accelerator CPU fallback must actually land on CPU.

Round-2 evidence (BENCH_r02.json): the re-exec'd process printed "falling
back to CPU" and then ran on "TPU v5 lite0" — the axon PJRT plugin
(registered by sitecustomize whenever PALLAS_AXON_POOL_IPS is set) overrode
JAX_PLATFORMS=cpu. The fix drops the plugin trigger vars from the re-exec
env and asserts jax.default_backend()=="cpu" before any device touch.

This test simulates a wedged tunnel (RQVAE_TPU_BENCH_FORCE_WEDGE=1) at the
quick geometry (RQVAE_TPU_BENCH_QUICK=1) and asserts the driver contract:
rc 0, a parseable final JSON line, measured on a CPU device.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.e2e
def test_wedge_fallback_runs_on_cpu_and_emits_json():
    env = dict(os.environ)
    env["RQVAE_TPU_BENCH_FORCE_WEDGE"] = "1"
    env["RQVAE_TPU_BENCH_QUICK"] = "1"
    # simulate the driver's real invocation env (TPU-targeting platform
    # selection), but WITHOUT the axon plugin trigger: sitecustomize's
    # register() would hang this subprocess at import if another process
    # holds the tunnel (CLAUDE.md). The fallback under test re-execs with
    # JAX_PLATFORMS=cpu and asserts the cpu backend either way.
    env["JAX_PLATFORMS"] = "axon"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=560, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "falling back to CPU" in r.stderr
    assert "CPU fallback active: backend=cpu" in r.stderr
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, r.stdout
    headline = json.loads(lines[-1])
    assert headline["metric"] == "corpus_tokenization_throughput"
    assert headline["value"] > 0
    # measured on CPU, not the (simulated-wedged) accelerator
    assert "CPU" in r.stderr.split("# ours:")[1].splitlines()[0]
    # quick-geometry numbers must never be persisted as baselines
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    assert base["items_per_sec"] > 500  # untouched full-geometry baseline
