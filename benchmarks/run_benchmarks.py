"""Full benchmark harness (SURVEY.md §6 table): corpus tokenization
throughput, constrained-beam-search queries/sec, and train-step throughput
for both stages, at the flagship Amazon-Beauty geometry.

bench.py at the repo root prints the single headline JSON line the driver
records; this harness produces the complete table:

    python benchmarks/run_benchmarks.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    """Genuine sync: fetch a value to the host. On remoted TPU transports
    jax.block_until_ready can resolve before execution finishes (see
    RESULTS.md), so timings MUST pull values."""
    import numpy as _np

    return _np.asarray(x).ravel()[0]


def bench_tokenization(n_items=65536, batch=8192, runs=5):
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
    from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

    cfg = RqVaeConfig(
        input_dim=768, embed_dim=32, hidden_dims=(512, 256, 128), codebook_size=256,
        n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE,
    )
    model = RqVae(cfg)
    rng = np.random.RandomState(0)
    corpus = rng.randn(n_items, 768).astype(np.float32)
    x0 = jnp.asarray(corpus[:4096])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x0, 0.2, training=True
    )
    params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, x0)
    tok = SemanticIdTokenizer(model, params, tokenize_batch_size=batch)
    _sync(tok.precompute_corpus_ids(corpus))  # compile + corpus upload
    t0 = time.perf_counter()
    for _ in range(runs):
        _sync(tok.precompute_corpus_ids(corpus))
    dt = (time.perf_counter() - t0) / runs
    return {"corpus_tokenization_items_per_sec": n_items / dt, "corpus_n_items": n_items}


def bench_beam(B=64, k=10, n_corpus=20000, n_items_seq=20, runs=10):
    """Constrained beam search QPS at the Amazon decoder geometry
    (d_model 384, 4 layers, 6 heads, seq 20 items x 4 tokens)."""
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data.schemas import TokenizedSeqBatch
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.serving.beam import build_prefix_table
    from rqvae_tpu.train.decoder_steps import make_generate_fn

    L, K = 3, 256
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, t5_dropout=0.1, top_k_for_generation=k,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)
    D = L + 1
    sem = rng.randint(0, K, (B, n_items_seq * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items_seq * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items_seq))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    corpus = jnp.asarray(rng.randint(0, K, (n_corpus, L)))
    table = build_prefix_table(corpus, K)
    gen = make_generate_fn(model)
    _sync(gen(params, batch, table).sem_ids)
    t0 = time.perf_counter()
    for _ in range(runs):
        _sync(gen(params, batch, table).sem_ids)
    dt = (time.perf_counter() - t0) / runs
    return {"beam_search_queries_per_sec": B / dt, "beam_batch": B, "beam_k": k}


def bench_train_steps(runs=20):
    """Train-step throughput at the flagship configs (examples/sec)."""
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
    from rqvae_tpu.train.rqvae_steps import make_rqvae_train_step
    from rqvae_tpu.train.state import TrainState, adamw

    out = {}
    # stage 1: batch 640 (configs/rqvae_amazon.gin)
    cfg = RqVaeConfig(
        input_dim=768, embed_dim=32, hidden_dims=(512, 256, 128), codebook_size=256,
        n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE,
    )
    model = RqVae(cfg)
    B = 640
    x = jnp.asarray(np.random.RandomState(0).randn(1, B, 768).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x[0], 0.2, training=True
    )
    tx = adamw(1e-3)
    state = TrainState.create(params, tx)
    step = make_rqvae_train_step(model, tx)
    state, m = step(state, x, jax.random.PRNGKey(0), jnp.float32(0.2))
    _sync(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(runs):
        state, m = step(state, x, jax.random.PRNGKey(i), jnp.float32(0.2))
    _sync(m["total_loss"])
    dt = (time.perf_counter() - t0) / runs
    out["rqvae_train_examples_per_sec"] = B / dt

    # stage 2: batch 640, d_model 384 (configs/decoder_amazon.gin)
    from rqvae_tpu.data.schemas import TokenizedSeqBatch
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.train.decoder_steps import make_decoder_train_step

    L, K, D = 3, 256, 4
    rcfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10,
    )
    rmodel = EncoderDecoderRetrievalModel(rcfg)
    rng = np.random.RandomState(0)
    n_items_seq = 20
    sem = rng.randint(0, K, (B, n_items_seq * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items_seq * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items_seq))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    rparams = rmodel.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    rtx = adamw(1e-3)
    rstate = TrainState.create(rparams, rtx)
    rstep = make_decoder_train_step(rmodel, rtx)
    rstate, rm = rstep(rstate, batch, jax.random.PRNGKey(0))
    _sync(rm["total_loss"])
    t0 = time.perf_counter()
    for i in range(runs):
        rstate, rm = rstep(rstate, batch, jax.random.PRNGKey(i))
    _sync(rm["total_loss"])
    dt = (time.perf_counter() - t0) / runs
    out["decoder_train_examples_per_sec"] = B / dt
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="reduced sizes for CPU smoke runs")
    args = ap.parse_args()

    import jax

    results = {"device": str(jax.devices()[0])}
    if args.small:
        results.update(bench_tokenization(n_items=2048, batch=1024, runs=2))
        results.update(bench_beam(B=4, n_corpus=500, runs=2))
    else:
        results.update(bench_tokenization())
        results.update(bench_beam())
        results.update(bench_train_steps())
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
