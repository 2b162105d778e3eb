"""Differential phase breakdown of the constrained-beam serving program.

Times (fold-proof, runtime trip count; slope of two counts cancels tunnel
RTT) progressively smaller sub-programs of generate() on the same
params/batch:

  enc    - encoder_forward only (T5 encoder over the [B, Le] row)
  dec    - ONE decoder_forward at the deepest level shape ([B*k, L] prefix,
           beam-folded cross-attention against a fixed enc)
  score  - level-1 candidate scoring: head matmul + log_softmax +
           extend_keys/is_valid_prefix + top_k over [B, k*K]
  full   - the whole generate() (3 decodes + 1 encode + 3 score stages)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/beam_phases.py [--items N] [--batch B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.serving.beam import build_prefix_table, valid_children

K, L, D = 256, 3, 4
CORPUS = 20000
TOPK = 10


def _slope(run, r1=20, r2=120, reps=5):
    run(r1)
    run(r2)
    t = {r1: float("inf"), r2: float("inf")}
    for _ in range(reps):
        for r in (r1, r2):
            t0 = time.perf_counter()
            run(r)
            t[r] = min(t[r], time.perf_counter() - t0)
    if t[r2] <= t[r1]:
        raise RuntimeError(f"non-positive slope: t({r2})={t[r2]:.4f} <= t({r1})={t[r1]:.4f}")
    return (t[r2] - t[r1]) / (r2 - r1)


def run_phases(batch_size=64, n_items=20, mode="auto"):
    B = batch_size
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=TOPK,
        t5_dtype="bfloat16", t5_fused_attention=mode,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    M = EncoderDecoderRetrievalModel
    rng = np.random.RandomState(0)
    sem = rng.randint(0, K, (B, n_items * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    corpus_ids = jnp.asarray(rng.randint(0, K, (CORPUS, L)), jnp.int32)
    table = build_prefix_table(corpus_ids, K)

    ids = jnp.asarray(sem[:, : n_items * L] % K, jnp.int32)  # stripped-shape stand-in
    mask = jnp.ones_like(ids)
    # consume-everything carry: shift next iter's int inputs by a value
    # derived from the full float output (cannot be constant-folded)
    def carry_of(x):
        return jnp.maximum(jnp.sum(x.astype(jnp.float32)).astype(jnp.int32), 0) % K

    # --- enc only ---
    @jax.jit
    def run_enc(params, ids, mask, uids, r):
        def body(_, c):
            enc, _m = model.apply(
                params, (ids + c) % K, mask, uids, False, method=M.encoder_forward
            )
            return carry_of(enc)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    # --- one deepest-level decode (fixed enc; beam-folded cross-attn) ---
    enc0, enc_mask0 = jax.jit(
        lambda p: model.apply(p, ids, mask, batch.user_ids, False, method=M.encoder_forward)
    )(params)
    prefix = jnp.asarray(rng.randint(0, K, (B * TOPK, L - 1)), jnp.int32)

    @jax.jit
    def run_dec(params, enc, enc_mask, prefix, r):
        def body(_, c):
            dec = model.apply(
                params, (prefix + c) % K, enc, enc_mask, beams=TOPK,
                method=M.decoder_forward,
            )[:, -1]
            return carry_of(dec)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    # --- level-1 score stage: heads + log_softmax + validity + top_k ---
    dec_feat = jnp.asarray(rng.randn(B * TOPK, 384), jnp.float32)
    parent_keys = jnp.asarray(rng.randint(0, K * K, (B, TOPK)), jnp.int32)

    @jax.jit
    def run_score(params, feat, parent_keys, table, r):
        heads = params["params"]["heads"]

        def body(_, c):
            logits = ((feat + c.astype(feat.dtype)) @ heads[1]).reshape(B, TOPK, K)
            logp = jax.nn.log_softmax(logits, axis=-1)
            # production path: row-gather validity (serving/beam.py)
            child_ok = valid_children(table, 1, parent_keys)[..., :K]
            scores = jnp.where(child_ok, logp, -1e9)
            top, idx = jax.lax.top_k(scores.reshape(B, TOPK * K), TOPK)
            return carry_of(top) + carry_of(idx)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    # --- full generate ---
    @jax.jit
    def run_full(params, batch, table, r):
        def body(_, c):
            out = model.apply(
                params, (batch.sem_ids + c) % K, batch.seq_mask, batch.user_ids,
                table, None, method=M.generate,
            )
            return carry_of(out.sem_ids) + carry_of(out.log_probas)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    dev = jax.devices()[0]
    p, bt, tb = jax.device_put(params, dev), jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev), batch
    ), jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), table)

    res = {}
    res["full"] = _slope(lambda r: run_full(p, bt, tb, r).block_until_ready())
    res["enc"] = _slope(lambda r: run_enc(p, ids, mask, bt.user_ids, r).block_until_ready())
    res["dec_L2"] = _slope(lambda r: run_dec(p, enc0, enc_mask0, prefix, r).block_until_ready())
    res["score_l1"] = _slope(lambda r: run_score(p, dec_feat, parent_keys, tb, r).block_until_ready())

    print(f"\nbeam phases (B={B}, items={n_items}, Le~={n_items * L + 1}, mode={mode}):")
    for k, v in res.items():
        print(f"  {k:10s} {v * 1e3:7.3f} ms/iter")
    approx = res["enc"] + 3 * res["dec_L2"] + 3 * res["score_l1"]
    print(f"  sum(enc + 3*dec + 3*score) ~= {approx * 1e3:.3f} ms vs full {res['full'] * 1e3:.3f} ms")
    print(f"  QPS(full) = {B / res['full']:.0f}")
    return res


if __name__ == "__main__":
    n_items = 20
    batch = 64
    if "--items" in sys.argv:
        n_items = int(sys.argv[sys.argv.index("--items") + 1])
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    run_phases(batch_size=batch, n_items=n_items)
