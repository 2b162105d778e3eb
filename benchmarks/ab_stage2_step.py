"""A/B: stage-2 train step with fused Pallas attention vs the XLA path.

Flagship Amazon geometry (decoder_amazon.gin): batch 640, d_model 384,
4 layers, 6 heads, d_ff 1024, dropout 0.1, bf16 compute. True device time
via R serially-dependent steps inside ONE jit (lax.scan), value-fetch
synced; also reports per-dispatch (tunnel-inclusive) time.

Usage: python benchmarks/ab_stage2_step.py [off|auto|on] [--steps N] [--f32]
         [--batch B] [--items N] [--block BB] [--drop0] [--flax-dropout]
         [--shardmap]

--shardmap runs the shard_map DP step over a mesh of ALL local devices
(1-device mesh on a single chip) instead of the scan harness — on a real
TPU this is the only check that proves the Pallas kernels LOWER under
shard_map (Mosaic errors are invisible to the interpret-mode CPU tests;
see CLAUDE.md).

run_scan() / run_shardmap() are importable so several geometries can be
measured in ONE process (the axon tunnel penalizes process churn).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.train.state import TrainState, adamw

B = 640
L, K, D = 3, 256, 4
N_ITEMS = 20


def make_batch(batch, n_items):
    rng = np.random.RandomState(0)
    sem = rng.randint(0, K, (batch, n_items * D))
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, batch)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (batch, D))),
        seq_mask=jnp.asarray(np.ones((batch, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (batch, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (batch, 1))),
    )


def _setup(mode, dtype, dropout, hash_dropout, bsz, n_items):
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10,
        t5_dtype=dtype, t5_fused_attention=mode,
        t5_hash_dropout=hash_dropout, t5_dropout=dropout,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    batch = make_batch(bsz, n_items)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    tx = adamw(1e-3)
    return model, batch, params, tx


def run_scan(mode="auto", bsz=B, n_items=N_ITEMS, n_scan=25, dtype="bfloat16",
             dropout=0.1, hash_dropout=True, reps=5):
    """R serially-dependent train steps in one jit; returns ms/step (best)."""
    model, batch, params, tx = _setup(mode, dtype, dropout, hash_dropout, bsz, n_items)
    state = TrainState.create(params, tx)

    def loss_fn(p, key):
        out = model.apply(p, batch, training=True, rngs={"dropout": key})
        return out.loss, out.loss_d

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def multi(state, key):
        seeds = jax.random.randint(key, (n_scan,), 0, 2**31 - 1)

        def body(st, seed):
            (_, ld), g = grad_fn(st.params, jax.random.key(seed, impl="rbg"))
            updates, opt = tx.update(g, st.opt_state, st.params)
            return TrainState(optax.apply_updates(st.params, updates), opt, st.step + 1), ld

        st, lds = jax.lax.scan(body, state, seeds)
        return st, lds[-1]

    print(f"mode={mode} dtype={dtype} backend={jax.default_backend()} "
          f"n_scan={n_scan} batch={bsz} items={n_items}")
    t0 = time.perf_counter()
    state, ld = multi(state, jax.random.PRNGKey(0))
    print("loss_d:", np.asarray(ld), f"(compile+run {time.perf_counter()-t0:.1f}s)")

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        state, ld = multi(state, jax.random.PRNGKey(i + 1))
        _ = np.asarray(ld)  # value-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"best-of-{reps} chunk: {best*1000:.1f} ms -> {best/n_scan*1000:.2f} ms/step "
          f"({bsz*n_scan/best:.0f} ex/s); all: {[f'{t*1000:.0f}' for t in times]}")
    return {"mode": mode, "batch": bsz, "items": n_items,
            "ms_per_step": best / n_scan * 1000, "ex_per_sec": bsz * n_scan / best}


def run_shardmap(mode="auto", bsz=B, n_items=N_ITEMS, dtype="bfloat16", dropout=0.1):
    """Compiled shard_map DP step (Pallas kernels run per-shard); on one
    real chip this proves Mosaic-under-shard_map lowering."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rqvae_tpu.train.decoder_steps import make_decoder_shardmap_train_step

    model, batch, params, tx = _setup(mode, dtype, dropout, True, bsz, n_items)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    state = TrainState.create(
        jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), params
        ),
        tx,
    )
    sbatch = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), batch
    )
    sm_step = make_decoder_shardmap_train_step(model, tx, mesh)
    t0 = time.perf_counter()
    state, m = sm_step(state, sbatch, jax.random.PRNGKey(0))
    loss0 = float(np.asarray(m["total_loss"]))
    print(f"shardmap mesh={mesh.devices.shape} mode={mode} batch={bsz} items={n_items} "
          f"compile+step {time.perf_counter()-t0:.1f}s loss={loss0:.4f}")
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, m = sm_step(state, sbatch, jax.random.PRNGKey(i + 1))
        l = float(np.asarray(m["total_loss"]))
        times.append(time.perf_counter() - t0)
    assert np.isfinite(l), l
    print(f"shardmap per-dispatch best-of-5: {min(times)*1000:.1f} ms  final loss={l:.4f}")
    return {"mode": mode, "batch": bsz, "items": n_items, "loss": l,
            "dispatch_ms": min(times) * 1000}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    n_scan = 25
    dtype = "float32" if "--f32" in sys.argv else "bfloat16"
    if "--steps" in sys.argv:
        n_scan = int(sys.argv[sys.argv.index("--steps") + 1])
    if "--block" in sys.argv:
        import functools
        import rqvae_tpu.ops.pallas.attention as A

        bb = int(sys.argv[sys.argv.index("--block") + 1])
        A.t5_attention = functools.partial(A.t5_attention, block_b=bb)
        print(f"block_b={bb}")
    dropout = 0.0 if "--drop0" in sys.argv else 0.1
    bsz, n_items = B, N_ITEMS
    if "--batch" in sys.argv:
        bsz = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--items" in sys.argv:
        n_items = int(sys.argv[sys.argv.index("--items") + 1])

    if "--shardmap" in sys.argv:
        run_shardmap(mode, bsz, n_items, dtype, dropout)
    else:
        run_scan(mode, bsz, n_items, n_scan, dtype, dropout,
                 hash_dropout="--flax-dropout" not in sys.argv)


if __name__ == "__main__":
    main()
