"""Beam-search device compute: R serially-dependent generate() calls in ONE
jit (round-2 pattern), A/B fused Pallas attention vs XLA in the encoder.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/beam_amortized.py [off|auto]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.serving.beam import build_prefix_table

B, K, L, D = 64, 256, 3, 4
N_ITEMS = 20
CORPUS = 20000
R = 50


def run_beam(mode="auto", batch_size=B, n_items=N_ITEMS, r=R, corpus=CORPUS, reps=5,
             fused_decode="auto", fused_encode="auto"):
    """Amortized constrained-beam QPS; importable for one-process sessions."""
    B, N_ITEMS, R, CORPUS = batch_size, n_items, r, corpus  # noqa: N806
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10,
        t5_dtype="bfloat16", t5_fused_attention=mode, t5_fused_decode=fused_decode,
        t5_fused_encode=fused_encode,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)
    sem = rng.randint(0, K, (B, N_ITEMS * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, N_ITEMS * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, N_ITEMS))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    corpus_ids = jnp.asarray(rng.randint(0, K, (CORPUS, L)), jnp.int32)
    table = build_prefix_table(corpus_ids, K)

    @jax.jit
    def amortized(params, batch, table):
        # fold-proof serial dependency: query ids shifted by the previous
        # result mod K. (`+ 0 * carry` is int math XLA constant-folds, after
        # which the loop-invariant body gets hoisted and the "R iterations"
        # time flat in R.)
        def body(carry, _):
            out = model.apply(
                params,
                (batch.sem_ids + jnp.maximum(carry, 0)) % K,
                batch.seq_mask,
                batch.user_ids,
                table,
                None,
                method=EncoderDecoderRetrievalModel.generate,
            )
            return jnp.min(out.sem_ids), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=R)
        return c

    print(f"mode={mode} fd={fused_decode} fe={fused_encode} backend={jax.default_backend()} R={R} B={B} items={N_ITEMS}")
    t0 = time.perf_counter()
    c = int(amortized(params, batch, table))
    print(f"compile+run {time.perf_counter()-t0:.1f}s (c={c})")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = int(amortized(params, batch, table))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"best-of-{reps}: {best/R*1000:.3f} ms/batch => {B*R/best:.0f} QPS device compute; "
          f"all: {[f'{t*1000:.0f}' for t in times]}")
    return {"mode": mode, "batch": B, "items": N_ITEMS, "qps": B * R / best,
            "ms_per_batch": best / R * 1000}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    batch = B
    n_items = N_ITEMS
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--items" in sys.argv:
        n_items = int(sys.argv[sys.argv.index("--items") + 1])
    fd = "auto"
    if "--fused-decode" in sys.argv:
        fd = sys.argv[sys.argv.index("--fused-decode") + 1]
    fe = "auto"
    if "--fused-encode" in sys.argv:
        fe = sys.argv[sys.argv.index("--fused-encode") + 1]
    run_beam(mode, batch, n_items, fused_decode=fd, fused_encode=fe)


if __name__ == "__main__":
    main()
