"""Measured train-step performance + MFU (VERDICT r4 Next #3).

Builds RUNTIME-trip-count fori_loop programs around the real train-step
cores (stage 1: rqvae_steps._train_step_core; stage 2: the fused
sample->tokenize->fwd/bwd->AdamW body of decoder_steps) and times them
differentially — (t(r2)-t(r1))/(r2-r1) cancels the per-dispatch transport
RTT of remoted runtimes (CLAUDE.md: block_until_ready lies through the
tunnel; RTT jitters minute-to-minute).

Fold-proofing: the loop carry is the full TrainState, and the fetched
value sums a PARAM leaf — params depend on grads every iteration, so the
serial chain cannot be constant-folded, hoisted, or DCE'd (the step
counter alone would be: step+1 is independent of the actual compute).

Consumed by bench.py (driver-captured train-perf rows) and
benchmarks/mfu_bench.py (the full Amazon + ML-32M table in RESULTS.md).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.utils import flops as flops_lib


def differential_time(run, r1: int = 5, r2: int = 55, reps: int = 3) -> float:
    """Per-iteration device time of `run(r)` (r serially-dependent device
    iterations per call, value-fetch synced); best-of-`reps` per point,
    trip counts interleaved so tunnel-congestion windows hit both."""
    run(r1)  # warmup (same compiled program for both trip counts)
    run(r2)
    t = {r1: float("inf"), r2: float("inf")}
    for _ in range(reps):
        for r in (r1, r2):
            t0 = time.perf_counter()
            run(r)
            t[r] = min(t[r], time.perf_counter() - t0)
    if t[r2] <= t[r1]:
        raise RuntimeError(
            f"differential timing failed: t({r2})={t[r2]:.4f}s <= t({r1})={t[r1]:.4f}s"
        )
    return (t[r2] - t[r1]) / (r2 - r1)


def _first_param_leaf(params):
    return jax.tree_util.tree_leaves(params)[0]


def measure_stage1_step(
    batch: int = 640,
    input_dim: int = 768,
    hidden_dims=(512, 256, 128),
    embed_dim: int = 32,
    codebook_size: int = 256,
    n_layers: int = 3,
    n_items: int = 20000,
    bf16: bool = False,
    r1: int = 50,
    r2: int = 550,
) -> dict:
    """Stage-1 (RQ-VAE) train-step time + MFU at the given geometry.
    Defaults = the Amazon flagship (configs/rqvae_amazon.gin)."""
    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
    from rqvae_tpu.train.rqvae_steps import _train_step_core
    from rqvae_tpu.train.state import TrainState, adamw

    if bf16:
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    cfg = RqVaeConfig(
        input_dim=input_dim, embed_dim=embed_dim, hidden_dims=tuple(hidden_dims),
        codebook_size=codebook_size, n_layers=n_layers, n_cat_feats=0,
        codebook_mode=QuantizeForwardMode.STE,
    )
    model = RqVae(cfg)
    rng = np.random.RandomState(0)
    features = jnp.asarray(rng.randn(n_items, input_dim).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        features[:2], 0.2, training=True,
    )
    tx = adamw(1e-3, weight_decay=1e-4)
    state = TrainState.create(params, tx)
    core = _train_step_core(model, tx)

    @jax.jit
    def run_steps(state, features, key, r):
        # carry the metric sum too: production steps COMPUTE the metrics
        # (incl. the O(B^2) p_unique_ids), so timing must not DCE them
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(key, i)
            idx = jax.random.randint(k, (1, batch), 0, n_items)
            st2, m = core(st, features[idx], k, jnp.float32(0.2))
            return st2, acc + (m["total_loss"] + m["p_unique_ids"]).astype(jnp.float32)

        st, acc = jax.lax.fori_loop(0, r, body, (state, jnp.float32(0.0)))
        return jnp.sum(_first_param_leaf(st.params)) + acc

    sec = differential_time(
        lambda r: float(run_steps(state, features, jax.random.PRNGKey(7), jnp.int32(r))),
        r1=r1, r2=r2,
    )
    f = flops_lib.rqvae_train_step_flops(
        batch, input_dim, hidden_dims, embed_dim, codebook_size, n_layers
    )
    # bf16 peak either way: JAX default matmul precision runs f32 operands
    # at the bf16 MXU rate on TPU (see flops.PEAK_FLOPS note)
    peak = "tpu_v5e_bf16"
    return {
        "seconds_per_step": sec,
        "examples_per_sec": batch / sec,
        "flops_per_step": f,
        "mfu": flops_lib.mfu(f, sec, peak),
        "peak": peak,
        "batch": batch,
    }


def measure_stage2_step(
    batch: int = 640,
    max_seq_len: int = 20,
    d_model: int = 384,
    num_heads: int = 6,
    d_kv: int = 64,
    d_ff: int = 1024,
    num_layers: int = 4,
    codebook_size: int = 256,
    n_hierarchies: int = 3,
    n_rows: int = 2000,
    n_corpus: int = 20000,
    dtype: str = "bfloat16",
    r1: int = 5,
    r2: int = 55,
    **cfg_overrides,
) -> dict:
    """Stage-2 (retrieval) fused train-step time + MFU. Defaults = the
    Amazon flagship (configs/decoder_amazon.gin + the shipped kernel
    stack: bf16, fused Pallas attention, hash dropout). The measured body
    is the production one: on-device window subsampling + cached-table
    tokenization + fwd/bwd + AdamW."""
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.train.decoder_steps import _make_batch_builder, _make_loss_fn
    from rqvae_tpu.train.state import TrainState, adamw

    cfg = RetrievalConfig(
        num_hierarchies=n_hierarchies, codebook_size=codebook_size,
        t5_d_model=d_model, t5_num_heads=num_heads, t5_d_kv=d_kv, t5_d_ff=d_ff,
        t5_num_layers=num_layers, t5_dropout=0.1, top_k_for_generation=10,
        t5_dtype=dtype, **cfg_overrides,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)
    D = n_hierarchies + 1
    total_len = max_seq_len + 2
    seq_items = jnp.asarray(rng.randint(0, n_corpus, (n_rows, total_len)), jnp.int32)
    seq_lengths = jnp.asarray(rng.randint(3, total_len + 1, n_rows), jnp.int32)
    user_ids = jnp.asarray(np.arange(n_rows), jnp.int32)
    ids = rng.randint(0, codebook_size, (n_corpus, n_hierarchies))
    cached = jnp.asarray(
        np.concatenate([ids, np.zeros((n_corpus, 1), np.int64)], 1), jnp.int32
    )

    build = _make_batch_builder(max_seq_len, leave_two_out=True, subsample=True)
    ex_idx = jnp.asarray(rng.randint(0, n_rows, batch), jnp.int32)
    u0 = jnp.zeros((batch,), jnp.float32) + 0.5
    example = build(seq_items, seq_lengths, user_ids, cached, ex_idx, u0, u0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        example, training=True,
    )
    tx = adamw(1e-3, weight_decay=0.01)
    state = TrainState.create(params, tx)
    grad_fn = jax.value_and_grad(_make_loss_fn(model), has_aux=True)

    import optax

    @jax.jit
    def run_steps(state, key, r):
        # carry the metric sum too (seq-length quantile telemetry is part
        # of the production step; don't let XLA DCE it out of the timing)
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(key, i)
            k_row, k_us, k_ue, k_drop = jax.random.split(k, 4)
            ri = jax.random.randint(k_row, (batch,), 0, n_rows)
            us = jax.random.uniform(k_us, (batch,))
            ue = jax.random.uniform(k_ue, (batch,))
            seed = jax.random.randint(k_drop, (), 0, 2**31 - 1)
            b = build(seq_items, seq_lengths, user_ids, cached, ri, us, ue)
            (_, m), grads = grad_fn(st.params, b, jax.random.key(seed, impl="rbg"))
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            return (
                TrainState(new_params, opt_state, st.step + 1),
                acc + (m["total_loss"] + m["seq_length_p50"]).astype(jnp.float32),
            )

        st, acc = jax.lax.fori_loop(0, r, body, (state, jnp.float32(0.0)))
        return jnp.sum(_first_param_leaf(st.params)) + acc

    sec = differential_time(
        lambda r: float(run_steps(state, jax.random.PRNGKey(7), jnp.int32(r))),
        r1=r1, r2=r2,
    )
    tokens_per_item = n_hierarchies + (1 if cfg.should_add_sep_token else 0)
    enc_len = max_seq_len * tokens_per_item
    dec_len = n_hierarchies + 1  # BOS + teacher-forced targets
    f = flops_lib.retrieval_train_step_flops(
        batch, enc_len, dec_len, d_model, num_heads, d_kv, d_ff,
        num_layers, codebook_size, n_hierarchies,
    )
    peak = "tpu_v5e_bf16"  # see flops.PEAK_FLOPS note (default precision)
    return {
        "seconds_per_step": sec,
        "examples_per_sec": batch / sec,
        "flops_per_step": f,
        "mfu": flops_lib.mfu(f, sec, peak),
        "peak": peak,
        "batch": batch,
        "enc_len": enc_len,
    }
