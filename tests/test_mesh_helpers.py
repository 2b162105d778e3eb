"""parallel/ coverage: mesh helpers (global batch assembly, sharding
specs) and the multi-host initialization gate (dist.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.data.schemas import SeqBatch
from rqvae_tpu.parallel.mesh import (
    batch_sharding,
    global_batch_from_process_local,
    make_mesh,
    replicate_pytree,
)


class TestGlobalBatch:
    def test_single_process_assembly(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh()
        batch = SeqBatch(
            user_ids=np.arange(16),
            ids=np.arange(16 * 4).reshape(16, 4),
            ids_fut=np.arange(16),
            x=np.ones((16, 4, 3), np.float32),
            x_fut=np.ones((16, 3), np.float32),
            seq_mask=np.ones((16, 4), bool),
        )
        g = global_batch_from_process_local(mesh, batch)
        assert g.ids.shape == (16, 4)
        sh = g.ids.sharding
        assert sh.is_fully_addressable
        # batch dim sharded over 8 devices -> each shard has 2 rows
        shard_shapes = {s.data.shape for s in g.ids.addressable_shards}
        assert shard_shapes == {(2, 4)}
        np.testing.assert_array_equal(np.asarray(g.ids), batch.ids)

    def test_replicated_params_on_all_devices(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh()
        p = replicate_pytree(mesh, {"w": jnp.ones((4, 4))})
        assert len(p["w"].addressable_shards) == 8
        assert all(s.data.shape == (4, 4) for s in p["w"].addressable_shards)


class TestProfilerTrace:
    def test_trace_context_writes_files(self, tmp_path):
        from rqvae_tpu.utils.profiling import trace

        @jax.jit
        def f(x):
            return x @ x

        with trace(str(tmp_path)):
            jax.block_until_ready(f(jnp.ones((64, 64))))
        import os

        found = []
        for root, _, files in os.walk(tmp_path):
            found.extend(files)
        assert found, "no trace files written"


class TestDistGate:
    """initialize_distributed must only call jax.distributed.initialize()
    under real pod markers (rqvae_tpu/parallel/dist.py)."""

    def _calls(self, monkeypatch, env):
        import rqvae_tpu.parallel.dist as dist

        calls = []
        monkeypatch.setattr(dist.jax.distributed, "initialize", lambda: calls.append(1))
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                  "MEGASCALE_COORDINATOR_ADDRESS", "RQVAE_TPU_DISTRIBUTED"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        monkeypatch.setattr(dist, "_initialized", False)
        dist.initialize_distributed()
        return len(calls)

    def test_single_host_markers_do_not_initialize(self, monkeypatch):
        assert self._calls(monkeypatch, {}) == 0
        # single-worker TPU VMs export their own hostname — NOT a pod
        assert self._calls(monkeypatch, {"TPU_WORKER_HOSTNAMES": "localhost"}) == 0
        assert self._calls(monkeypatch, {"RQVAE_TPU_DISTRIBUTED": "0",
                                         "JAX_COORDINATOR_ADDRESS": "h:1234"}) == 0

    def test_pod_markers_initialize(self, monkeypatch):
        assert self._calls(monkeypatch, {"JAX_COORDINATOR_ADDRESS": "h:1234"}) == 1
        assert self._calls(monkeypatch, {"COORDINATOR_ADDRESS": "h:1234"}) == 1
        assert self._calls(monkeypatch, {"TPU_WORKER_HOSTNAMES": "h0,h1,h2,h3"}) == 1
        assert self._calls(monkeypatch, {"MEGASCALE_COORDINATOR_ADDRESS": "h:8080"}) == 1
        assert self._calls(monkeypatch, {"RQVAE_TPU_DISTRIBUTED": "1"}) == 1

    def test_manual_coordinator_path(self, monkeypatch):
        # RQVAE_TPU_NUM_PROCESSES/_PROCESS_ID route explicit args into
        # jax.distributed.initialize (the 2-process launch regime;
        # exercised for real by test_multiprocess.py)
        import pytest
        import rqvae_tpu.parallel.dist as dist

        calls = []
        monkeypatch.setattr(
            dist.jax.distributed, "initialize", lambda **kw: calls.append(kw)
        )
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                  "MEGASCALE_COORDINATOR_ADDRESS", "RQVAE_TPU_DISTRIBUTED"):
            monkeypatch.delenv(k, raising=False)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:9999")
        monkeypatch.setenv("RQVAE_TPU_NUM_PROCESSES", "2")
        monkeypatch.setenv("RQVAE_TPU_PROCESS_ID", "1")
        monkeypatch.setattr(dist, "_initialized", False)
        dist.initialize_distributed()
        assert calls == [{"coordinator_address": "localhost:9999",
                          "num_processes": 2, "process_id": 1}]
        # NUM_PROCESSES without any coordinator address must raise
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
        monkeypatch.setattr(dist, "_initialized", False)
        with pytest.raises(ValueError, match="coordinator"):
            dist.initialize_distributed()

    def test_force_knob_rejects_typos(self, monkeypatch):
        # "true"/"yes" must raise, not silently fall through to auto-detect
        import pytest

        for bad in ("true", "yes", "2"):
            with pytest.raises(ValueError, match="RQVAE_TPU_DISTRIBUTED"):
                self._calls(monkeypatch, {"RQVAE_TPU_DISTRIBUTED": bad})
