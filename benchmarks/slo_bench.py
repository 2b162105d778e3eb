"""Serving latency SLO on the real chip (VERDICT r3 Next #3): drive
`AsyncRetrievalEngine` end-to-end against the TPU with Poisson arrivals
over the lognormal history-length mix (engine_bench.py's distribution) and
record SUSTAINED QPS + p50/p95/p99 end-to-end latency from stats() at
several offered-load points — measured, not priced from per-bucket device
timings.

The serving stack is the real one: submit() -> micro-batching queue ->
RetrievalEngine shape buckets -> jit'd Retriever query (tokenize ->
encoder -> constrained beam -> inverse item lookup). Model params are
random-init at the flagship geometry (latency does not depend on weight
values); the corpus is 20k items. NOTE: on this host every dispatch rides
the axon tunnel (RTT ~5-30 ms, minute-scale jitter) — latencies INCLUDE
transport, so directly-attached deployments sit strictly below these
numbers.

Overload admission control (SLO v5): pass --depth N and/or --deadline-ms D
to bound the queue — past the saturation knee excess load is REJECTED at
submit (QueueOverloadedError) or SHED at batch-cut (DeadlineExceededError)
instead of stretching every admitted request's latency without limit
(SLO v4 measured p50 34 s at 4x the knee, unbounded). Reported per load
point: goodput (served requests/s), reject/shed rates, and latency
percentiles over ADMITTED-AND-SERVED requests.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/slo_bench.py \
    [--loads 250,1000,2000,4000] [--seconds 15] [--max-delay-ms 5] \
    [--depth 256] [--deadline-ms 500]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CORPUS = 20000
MAX_ITEMS = 200
K, L = 256, 3


def build_engine(max_delay_ms: float):
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
    from rqvae_tpu.serving.engine import RetrievalEngine
    from rqvae_tpu.serving.queue import AsyncRetrievalEngine
    from rqvae_tpu.serving.retriever import Retriever
    from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

    rng = np.random.RandomState(0)
    # tokenizer: serving only reads cached_ids (table-lookup tokenization);
    # inject a random corpus index directly instead of training a VAE
    vcfg = RqVaeConfig(input_dim=32, embed_dim=8, hidden_dims=(16,), codebook_size=K,
                       n_layers=L, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE)
    rq = RqVae(vcfg)
    rq_params = rq.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        jnp.zeros((2, 32)), 0.2, training=True,
    )
    tok = SemanticIdTokenizer(rq, rq_params, use_pallas=False)
    ids = rng.randint(0, K, (CORPUS, L))
    # dedup column consistent with the build semantics (count of earlier dups)
    seen: dict = {}
    dedup = np.zeros(CORPUS, np.int64)
    for i, row in enumerate(map(tuple, ids)):
        dedup[i] = seen.get(row, 0)
        seen[row] = dedup[i] + 1
    tok.cached_ids = jnp.asarray(np.concatenate([ids, dedup[:, None]], 1), jnp.int32)

    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10, t5_dtype="bfloat16",
    )
    model = EncoderDecoderRetrievalModel(cfg)
    from rqvae_tpu.data.schemas import TokenizedSeqBatch

    D = L + 1
    ex = TokenizedSeqBatch(
        user_ids=jnp.zeros(1, jnp.int32), sem_ids=jnp.zeros((1, D), jnp.int32),
        sem_ids_fut=jnp.zeros((1, D), jnp.int32), seq_mask=jnp.ones((1, D), bool),
        token_type_ids=jnp.zeros((1, D), jnp.int32),
        token_type_ids_fut=jnp.zeros((1, D), jnp.int32),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, training=True,
    )
    retr = Retriever(model, params, tok)
    eng = RetrievalEngine(retr, max_items=MAX_ITEMS,
                          item_buckets=(8, 32, 128, MAX_ITEMS),
                          batch_buckets=(1, 8, 64))
    return eng, AsyncRetrievalEngine(eng, max_delay_ms=max_delay_ms, autostart=False)


def lognormal_lengths(rng, n):
    return np.clip(np.exp(rng.normal(np.log(20), 1.0, n)).astype(int), 1, MAX_ITEMS)


def warmup(eng):
    """Compile every (batch, items) bucket program before measuring."""
    rng = np.random.RandomState(1)
    t0 = time.perf_counter()
    for ib in eng.item_buckets:
        for bb in eng.batch_buckets:
            hists = [rng.randint(0, CORPUS, ib).astype(np.int32) for _ in range(bb)]
            eng.retrieve_many(hists)
    print(f"warmup: compiled {len(eng.item_buckets) * len(eng.batch_buckets)} "
          f"bucket programs in {time.perf_counter() - t0:.0f}s", flush=True)


def run_load_point(queue, rate_qps: float, seconds: float, rng) -> dict:
    n = int(rate_qps * seconds)
    lengths = lognormal_lengths(rng, n)
    hists = [rng.randint(0, CORPUS, l).astype(np.int32) for l in lengths]
    gaps = rng.exponential(1.0 / rate_qps, n)
    queue.start()
    futs = []
    t_start = time.monotonic()
    next_t = t_start
    behind_max = 0.0
    for i in range(n):
        next_t += gaps[i]
        now = time.monotonic()
        if next_t > now:
            time.sleep(next_t - now)
        else:
            behind_max = max(behind_max, now - next_t)
        futs.append(queue.submit(hists[i]))
    from rqvae_tpu.serving.queue import DeadlineExceededError, QueueOverloadedError

    served = 0
    for f in futs:
        try:
            f.result(timeout=300)
            served += 1
        except (QueueOverloadedError, DeadlineExceededError):
            pass  # typed overload outcomes; counted via stats()
    t_done = time.monotonic()
    s = queue.stats()
    out = {
        "offered_qps": rate_qps,
        "sustained_qps": n / (t_done - t_start),
        # goodput: requests actually served (admitted and not shed) per
        # second of wall clock — the SLO v5 headline under overload
        "goodput_qps": served / (t_done - t_start),
        "reject_rate": s["rejected"] / max(n, 1),
        "shed_rate": s["shed"] / max(n, 1),
        # percentiles cover ADMITTED-AND-SERVED requests only
        "p50_ms": s.get("latency_p50_s", float("nan")) * 1e3,
        "p95_ms": s.get("latency_p95_s", float("nan")) * 1e3,
        "p99_ms": s.get("latency_p99_s", float("nan")) * 1e3,
        "mean_batch": s.get("batch_size_mean"),
        "flushes": s["flushes"],
        "requests": n,
        "arrival_lag_max_s": behind_max,  # >0 => open-loop clock fell behind
    }
    return out


def main():
    argv = sys.argv[1:]
    loads = [250, 1000, 2000, 4000]
    seconds = 15.0
    max_delay_ms = 5.0
    depth = None
    deadline_ms = None
    if "--loads" in argv:
        loads = [float(x) for x in argv[argv.index("--loads") + 1].split(",")]
    if "--seconds" in argv:
        seconds = float(argv[argv.index("--seconds") + 1])
    if "--max-delay-ms" in argv:
        max_delay_ms = float(argv[argv.index("--max-delay-ms") + 1])
    if "--depth" in argv:
        depth = int(argv[argv.index("--depth") + 1])
    if "--deadline-ms" in argv:
        deadline_ms = float(argv[argv.index("--deadline-ms") + 1])

    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    eng, queue = build_engine(max_delay_ms)
    warmup(eng)

    rows = []
    rng = np.random.RandomState(7)
    for rate in loads:
        # fresh queue per point: stats() windows must not mix loads
        from rqvae_tpu.serving.queue import AsyncRetrievalEngine

        queue = AsyncRetrievalEngine(
            eng, max_delay_ms=max_delay_ms, autostart=False,
            max_queue_depth=depth, deadline_ms=deadline_ms,
        )
        r = run_load_point(queue, rate, seconds, rng)
        queue.close()
        rows.append(r)
        print(json.dumps(r), flush=True)

    print(f"\nmax_delay_ms={max_delay_ms}; depth={depth}; deadline_ms={deadline_ms}; "
          f"lognormal(len) median 20, max {MAX_ITEMS}; "
          f"corpus {CORPUS}; tunnel transport INCLUDED")
    print("| offered QPS | goodput | reject% | shed% | p50 ms | p95 ms | p99 ms | mean batch |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['offered_qps']:.0f} | {r['goodput_qps']:.0f} "
              f"| {100 * r['reject_rate']:.1f} | {100 * r['shed_rate']:.1f} "
              f"| {r['p50_ms']:.1f} | {r['p95_ms']:.1f} | {r['p99_ms']:.1f} "
              f"| {r['mean_batch'] or float('nan'):.1f} |")
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
