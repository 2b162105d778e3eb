"""TRUE multi-process execution: 2 real processes x 4 CPU devices each.

Everything else multi-device in this suite is one process with virtual
devices; this test launches two actual processes through
jax.distributed.initialize (via parallel/dist.py's manual-coordinator
path), assembles the global batch with
parallel/mesh.py::global_batch_from_process_local, runs the jitted DP
stage-2 train step, and round-trips an Orbax checkpoint across processes —
the regime the reference reaches via `accelerate launch`
(/root/reference/train_rqvae.py:67-70,153).

Asserts: per-step losses equal the single-process 8-device run, processes
agree with each other, and the cross-process Orbax save->restore is exact.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nprocs, port, ckpt_dir):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never register the TPU plugin
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "RQVAE_TPU_NUM_PROCESSES", "RQVAE_TPU_PROCESS_ID"):
        env.pop(k, None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(nprocs), str(pid), str(port), ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(nprocs)
    ]
    # gather ALL workers before asserting: if one hangs or dies, kill the
    # rest (a peer blocked in jax.distributed.initialize would otherwise
    # leak) and surface every worker's stderr, not just the first's
    results = []
    try:
        for p in procs:
            try:
                out, err = p.communicate(timeout=280)
            except subprocess.TimeoutExpired:
                p.kill()
                out, err = p.communicate()
                err = f"[TIMED OUT]\n{err}"
            results.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(rc == 0 for rc, _, _ in results), "\n".join(
        f"--- worker {i} rc={rc} ---\n{err[-2000:]}" for i, (rc, _, err) in enumerate(results)
    )
    return [json.loads(out.strip().splitlines()[-1]) for _, out, _ in results]


@pytest.mark.filterwarnings("ignore")
@pytest.mark.e2e
def test_two_processes_match_single_process(tmp_path):
    golden = _launch(1, _free_port(), str(tmp_path / "ck1"))[0]
    pair = _launch(2, _free_port(), str(tmp_path / "ck2"))

    assert [p["nprocs"] for p in pair] == [2, 2]
    # both processes observe the identical global program results
    np.testing.assert_array_equal(pair[0]["losses"], pair[1]["losses"])
    assert pair[0]["param_norm"] == pair[1]["param_norm"]
    # 2-process DP == single-process 8-device DP (reduction-order tolerance)
    np.testing.assert_allclose(pair[0]["losses"], golden["losses"], rtol=2e-6)
    np.testing.assert_allclose(pair[0]["param_norm"], golden["param_norm"], rtol=2e-6)
    # Orbax save->restore across processes is exact
    assert pair[0]["orbax_max_delta"] == 0.0
    assert golden["orbax_max_delta"] == 0.0
