"""Orbax checkpoint backend: round-trip, and sharded save -> restore ->
resume equality under the 4x2 DP x TP mesh (multi-host recovery, SURVEY.md
§5.3-5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.rqvae import RqVaeConfig
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.utils.checkpoint_orbax import load_checkpoint_orbax, save_checkpoint_orbax


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path):
        params = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
        tx = adamw(1e-3)
        state = TrainState.create(params, tx)
        cfg = RqVaeConfig(input_dim=9)
        path = save_checkpoint_orbax(str(tmp_path), 17, state.params, state.opt_state, cfg)
        restored = load_checkpoint_orbax(
            path, params_template=params, opt_state_template=state.opt_state
        )
        assert restored["step"] == 17
        assert restored["config"].input_dim == 9
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["params"]["w"]), np.arange(6.0).reshape(2, 3)
        )


def _sharded_training_setup():
    """Tiny retrieval model trained on a data(4) x model(2) mesh with real
    TP shardings (same topology dryrun_multichip validates)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rqvae_tpu.data.schemas import TokenizedSeqBatch
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.parallel.mesh import batch_sharding, make_mesh
    from rqvae_tpu.parallel.tp import shard_params
    from rqvae_tpu.train.decoder_steps import make_decoder_train_step

    mesh = make_mesh(n_data=4, n_model=2)
    L, K, B, n_items = 3, 16, 8, 3
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=32, t5_d_kv=8,
        t5_num_heads=4, t5_d_ff=64, t5_num_layers=1, t5_dropout=0.1,
        top_k_for_generation=5,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)
    D = L + 1
    sem = rng.randint(0, K, (B, n_items * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 100, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        training=True,
    )
    params = shard_params(mesh, params)
    tx = adamw(1e-2)
    batch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, batch_sharding(mesh, batch_axis=0)), batch
    )
    step = make_decoder_train_step(model, tx)
    return mesh, model, params, tx, batch, step


class TestOrbaxShardedResume:
    def test_sharded_save_restore_resume_equals_uninterrupted(self, tmp_path):
        from rqvae_tpu.parallel.tp import shard_params

        mesh, model, params, tx, batch, step = _sharded_training_setup()
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

        # uninterrupted 3-step run
        state_a = TrainState.create(copy(params), tx)
        for i in range(3):
            state_a, _ = step(state_a, batch, jax.random.PRNGKey(100 + i))

        # 2 steps -> orbax save (sharded arrays) -> restore -> 1 more step
        state_b = TrainState.create(copy(params), tx)
        for i in range(2):
            state_b, _ = step(state_b, batch, jax.random.PRNGKey(100 + i))
        cfg = RqVaeConfig(input_dim=9)
        path = save_checkpoint_orbax(
            str(tmp_path), int(state_b.step), state_b.params, state_b.opt_state, cfg
        )

        # restore against SHARDED templates: leaves come back with the same
        # NamedShardings (multi-host recovery onto the same mesh)
        fresh = TrainState.create(shard_params(mesh, copy(params)), tx)
        restored = load_checkpoint_orbax(
            path, params_template=fresh.params, opt_state_template=fresh.opt_state
        )
        assert restored["step"] == 2
        r_params, r_opt = restored["params"], restored["opt_state"]
        # shardings preserved on the restored params
        sharded_leaves = [
            leaf for leaf in jax.tree_util.tree_leaves(r_params)
            if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
        ]
        assert sharded_leaves, "expected at least one TP-sharded restored leaf"

        # restored scalar leaves (opt counts) come back committed to one
        # device; re-commit them to the mesh before resuming
        from rqvae_tpu.parallel.mesh import commit_scalars

        r_opt = commit_scalars(mesh, r_opt)
        state_c = TrainState(r_params, r_opt, jnp.asarray(restored["step"], jnp.int32))
        state_c = TrainState(
            state_c.params, state_c.opt_state, commit_scalars(mesh, state_c.step)
        )
        state_c, _ = step(state_c, batch, jax.random.PRNGKey(102))

        for pa, pc in zip(
            jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_c.params)
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pc), rtol=1e-6, atol=1e-7)

    def test_restore_to_different_topology(self, tmp_path):
        # save from the 4x2 mesh, restore fully replicated (topology change
        # between save and resume — e.g. recovering on fewer hosts)
        mesh, model, params, tx, batch, step = _sharded_training_setup()
        state = TrainState.create(params, tx)
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        cfg = RqVaeConfig(input_dim=9)
        path = save_checkpoint_orbax(str(tmp_path), 1, state.params, state.opt_state, cfg)

        host_params = jax.device_get(state.params)  # ground truth values
        template = jax.tree_util.tree_map(jnp.zeros_like, host_params)  # single-device
        restored = load_checkpoint_orbax(path, params_template=template)
        for a, b in zip(
            jax.tree_util.tree_leaves(host_params),
            jax.tree_util.tree_leaves(restored["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
