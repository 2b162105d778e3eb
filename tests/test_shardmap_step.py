"""shard_map data-parallel stage-2 step: equality with the single-device
step on an 8-virtual-device CPU mesh, and Pallas-kernel-per-shard execution
(interpret mode). Replaces the reference's Accelerate DDP all-reduce
(reference train_decoder.py:73-76,194)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.train.decoder_steps import (
    make_decoder_shardmap_train_step,
    make_decoder_train_step,
)
from rqvae_tpu.train.state import TrainState, adamw

L, K, D = 3, 16, 4
B = 16


def _make_batch(seed=0, n_items=6):
    rng = np.random.RandomState(seed)
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 100, B)),
        sem_ids=jnp.asarray(rng.randint(0, K, (B, n_items * D))),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )


def _setup(cfg):
    model = EncoderDecoderRetrievalModel(cfg)
    batch = _make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        training=True,
    )
    tx = adamw(1e-3)
    return model, tx, params, batch


class TestShardMapStep:
    def test_matches_single_device_step(self):
        # dropout 0: the shard_map step folds axis_index into dropout seeds,
        # so only the no-dropout loss/grads are bitwise-comparable
        cfg = RetrievalConfig(
            num_hierarchies=L, codebook_size=K, t5_d_model=32, t5_d_kv=8,
            t5_num_heads=2, t5_d_ff=64, t5_num_layers=2, t5_dropout=0.0,
        )
        model, tx, params, batch = _setup(cfg)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))

        # device_put BEFORE ref_step: the jitted steps donate their state,
        # deleting the original param buffers
        sharded_params = jax.device_put(params, NamedSharding(mesh, P()))
        batch_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        # fresh copy: device_put's replicated output ALIASES the device-0
        # shard, which ref_step's donation would otherwise delete
        ref_params = jax.tree.map(jnp.copy, params)
        ref_step = make_decoder_train_step(model, tx)
        ref_state, ref_metrics = ref_step(
            TrainState.create(ref_params, tx), batch, jax.random.PRNGKey(2)
        )
        sm_step = make_decoder_shardmap_train_step(model, tx, mesh)
        sm_state, sm_metrics = sm_step(
            TrainState.create(sharded_params, tx), batch_sh, jax.random.PRNGKey(2)
        )

        np.testing.assert_allclose(
            float(sm_metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-5
        )
        errs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), sm_state.params, ref_state.params
        )
        assert max(jax.tree.leaves(errs)) < 1e-5

    def test_dropout_runs_and_shards_decorrelate(self):
        cfg = RetrievalConfig(
            num_hierarchies=L, codebook_size=K, t5_d_model=32, t5_d_kv=8,
            t5_num_heads=2, t5_d_ff=64, t5_num_layers=2, t5_dropout=0.3,
        )
        model, tx, params, batch = _setup(cfg)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        batch_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        sm_step = make_decoder_shardmap_train_step(model, tx, mesh)
        st1, m1 = sm_step(TrainState.create(params, tx), batch_sh, jax.random.PRNGKey(3))
        st2, m2 = sm_step(st1, batch_sh, jax.random.PRNGKey(4))
        assert np.isfinite(float(m1["total_loss"])) and np.isfinite(float(m2["total_loss"]))

    def test_pallas_kernel_runs_per_shard(self):
        # fused_attention="interpret" inside shard_map: proves the Pallas
        # kernel path executes on per-shard local shapes under the mesh
        cfg = RetrievalConfig(
            num_hierarchies=L, codebook_size=K, t5_d_model=32, t5_d_kv=8,
            t5_num_heads=2, t5_d_ff=64, t5_num_layers=1, t5_dropout=0.0,
            t5_fused_attention="interpret",
        )
        cfg_off = RetrievalConfig(
            num_hierarchies=L, codebook_size=K, t5_d_model=32, t5_d_kv=8,
            t5_num_heads=2, t5_d_ff=64, t5_num_layers=1, t5_dropout=0.0,
            t5_fused_attention="off",
        )
        model, tx, params, batch = _setup(cfg)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        batch_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
        )
        params2 = jax.tree.map(jnp.copy, params)  # steps donate their state
        sm_fused = make_decoder_shardmap_train_step(model, tx, mesh)
        st_f, m_f = sm_fused(TrainState.create(params, tx), batch_sh, jax.random.PRNGKey(5))

        model_off = EncoderDecoderRetrievalModel(cfg_off)
        sm_off = make_decoder_shardmap_train_step(model_off, tx, mesh)
        st_o, m_o = sm_off(TrainState.create(params2, tx), batch_sh, jax.random.PRNGKey(5))
        np.testing.assert_allclose(
            float(m_f["total_loss"]), float(m_o["total_loss"]), rtol=1e-5
        )
