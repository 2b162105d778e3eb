"""A/B: stage-2 train step with fused Pallas attention vs the XLA path.

Flagship Amazon geometry (decoder_amazon.gin): batch 640, d_model 384,
4 layers, 6 heads, d_ff 1024, dropout 0.1, bf16 compute. True device time
via R serially-dependent steps inside ONE jit (lax.scan), value-fetch
synced; also reports per-dispatch (tunnel-inclusive) time.

Usage: python benchmarks/ab_stage2_step.py [off|auto] [--steps N] [--f32]
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

    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10,
        t5_dtype=dtype, t5_fused_attention=mode,
        t5_hash_dropout="--flax-dropout" not in sys.argv,
        t5_dropout=dropout,
    )

    model = EncoderDecoderRetrievalModel(cfg)
    batch = make_batch(bsz, n_items)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    tx = adamw(1e-3)
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
    for i in range(5):
        t0 = time.perf_counter()
        state, ld = multi(state, jax.random.PRNGKey(i + 1))
        _ = np.asarray(ld)  # value-fetch sync
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"best-of-5 chunk: {best*1000:.1f} ms -> {best/n_scan*1000:.2f} ms/step "
          f"({bsz*n_scan/best:.0f} ex/s); all: {[f'{t*1000:.0f}' for t in times]}")


if __name__ == "__main__":
    main()
