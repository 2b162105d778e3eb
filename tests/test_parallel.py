"""Multi-device tests on 8 virtual CPU devices: sharded-vs-single-device
numerical equivalence of train steps, TP sharding rules, and the driver
dry-run (SURVEY.md §4's distributed test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
from rqvae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_pytree
from rqvae_tpu.parallel.tp import retrieval_param_specs, shard_params
from rqvae_tpu.train.decoder_steps import make_decoder_train_step, make_generate_fn
from rqvae_tpu.train.rqvae_steps import make_rqvae_train_step
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.serving.beam import build_prefix_table


def _require_8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")


class TestMesh:
    def test_make_mesh_shapes(self):
        _require_8()
        m = make_mesh()
        assert m.devices.shape == (8, 1)
        m2 = make_mesh(n_data=4, n_model=2)
        assert m2.devices.shape == (4, 2)
        assert m2.axis_names == ("data", "model")


class TestRqVaeDP:
    def test_sharded_step_matches_single_device(self):
        _require_8()
        cfg = RqVaeConfig(
            input_dim=24,
            embed_dim=8,
            hidden_dims=(16,),
            codebook_size=16,
            n_layers=3,
            n_cat_feats=0,
            codebook_mode=QuantizeForwardMode.STE,
        )
        model = RqVae(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 24).astype(np.float32))
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x[0],
            0.2,
            training=True,
        )
        tx = adamw(1e-3)
        step = make_rqvae_train_step(model, tx)
        key = jax.random.PRNGKey(7)

        # single device
        s_single = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
        s_single, m_single = step(s_single, jnp.copy(x), key, jnp.float32(0.2))

        # 8-device DP
        mesh = make_mesh()
        s_shard = replicate_pytree(mesh, TrainState.create(params, tx))
        xs = jax.device_put(x, batch_sharding(mesh, batch_axis=1))
        s_shard, m_shard = step(s_shard, xs, key, jnp.float32(0.2))

        assert float(m_single["total_loss"]) == pytest.approx(
            float(m_shard["total_loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_single.params), jax.tree_util.tree_leaves(s_shard.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _tiny_batch(rng, B, K, L, n_items=3):
    D = L + 1
    sem = rng.randint(0, K, (B, n_items * D))
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 50, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )


class TestDecoderDPTP:
    def _setup(self):
        K, L = 16, 3
        cfg = RetrievalConfig(
            num_hierarchies=L,
            codebook_size=K,
            t5_d_model=32,
            t5_d_kv=8,
            t5_num_heads=4,
            t5_d_ff=64,
            t5_num_layers=2,
            t5_dropout=0.0,
            top_k_for_generation=4,
        )
        model = EncoderDecoderRetrievalModel(cfg)
        rng = np.random.RandomState(0)
        batch = _tiny_batch(rng, 16, K, L)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            training=True,
        )
        return cfg, model, params, batch, rng

    def test_tp_specs_cover_transformer(self):
        cfg, model, params, batch, _ = self._setup()
        specs = retrieval_param_specs(params)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        by_name = {"/".join(str(getattr(p, "key", "")) for p in path): s for path, s in flat}
        assert any("sid_embedding" in k and s == P("model", None) for k, s in by_name.items())
        assert any("wi" in k and s == P(None, "model") for k, s in by_name.items())
        assert any("wo" in k and s == P("model", None) for k, s in by_name.items())
        assert any("heads" in k and s == P(None, None, "model") for k, s in by_name.items())

    def test_dp_tp_step_matches_single_device(self):
        _require_8()
        cfg, model, params, batch, _ = self._setup()
        tx = adamw(1e-3)
        step = make_decoder_train_step(model, tx)
        key = jax.random.PRNGKey(3)

        s_single = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)
        s_single, m_single = step(s_single, batch, key)

        mesh = make_mesh(n_data=4, n_model=2)
        sharded_params = shard_params(mesh, params)
        s_shard = TrainState.create(sharded_params, tx)
        bsh = batch_sharding(mesh, batch_axis=0)
        batch_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, bsh), batch)
        s_shard, m_shard = step(s_shard, batch_sh, key)

        assert float(m_single["total_loss"]) == pytest.approx(
            float(m_shard["total_loss"]), rel=1e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_single.params), jax.tree_util.tree_leaves(s_shard.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_generation_matches_under_sharding(self):
        _require_8()
        cfg, model, params, batch, rng = self._setup()
        corpus = rng.randint(0, cfg.codebook_size, (30, cfg.num_hierarchies))
        table = build_prefix_table(jnp.asarray(corpus), cfg.codebook_size)
        gen = make_generate_fn(model)
        out_single = gen(params, batch, table)

        mesh = make_mesh(n_data=4, n_model=2)
        p_sh = shard_params(mesh, params)
        bsh = batch_sharding(mesh, batch_axis=0)
        batch_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, bsh), batch)
        out_shard = gen(p_sh, batch_sh, table)

        np.testing.assert_array_equal(np.asarray(out_single.sem_ids), np.asarray(out_shard.sem_ids))
        np.testing.assert_allclose(
            np.asarray(out_single.log_probas), np.asarray(out_shard.log_probas), atol=1e-4
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    def test_dryrun_multichip(self):
        _require_8()
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestShardedTokenizer:
    def test_sharded_corpus_build_matches_unsharded(self):
        # corpus rows sharded over 'data' (SURVEY §5.7): same index table
        _require_8()
        from rqvae_tpu.models.rqvae import kmeans_init_codebooks
        from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

        cfg = RqVaeConfig(
            input_dim=32, embed_dim=8, hidden_dims=(16,), codebook_size=16,
            n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE,
        )
        model = RqVae(cfg)
        rng = np.random.RandomState(0)
        corpus = rng.randn(512, 32).astype(np.float32)
        x0 = jnp.asarray(corpus[:128])
        params = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x0, 0.2, training=True,
        )
        params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, x0)

        plain = SemanticIdTokenizer(model, params, tokenize_batch_size=128)
        ids_plain = np.asarray(plain.precompute_corpus_ids(corpus))

        mesh = make_mesh()
        sharded = SemanticIdTokenizer(
            model, replicate_pytree(mesh, params), tokenize_batch_size=128,
            sharding=batch_sharding(mesh, batch_axis=0),
        )
        out = sharded.precompute_corpus_ids(corpus)
        np.testing.assert_array_equal(np.asarray(out), ids_plain)


class TestTpSpecEdge:
    def test_low_rank_leaf_gets_trailing_spec(self):
        # a 1-D leaf matching a matmul rule (e.g. a bias under "wi") must
        # get the rule's trailing entries, not an over-long PartitionSpec
        import numpy as np

        params = {"params": {"encoder": {"block_0": {"ffn": {"wi": {
            "kernel": np.zeros((8, 16), np.float32),
            "bias": np.zeros((16,), np.float32),
        }}}}}}
        specs = retrieval_param_specs(params)
        wi = specs["params"]["encoder"]["block_0"]["ffn"]["wi"]
        assert wi["kernel"] == P(None, "model")
        assert wi["bias"] == P("model")
