"""Benchmark harness: the two BASELINE.json north-star metrics on the
current default JAX device (real TPU when present):

  1. corpus-tokenization throughput (items/sec)  — headline metric
  2. constrained-beam-search throughput (queries/sec)

Prints one JSON line per metric; the LAST line is the headline
corpus-tokenization record (the driver parses the last line) and carries the
beam numbers as extra keys so both land in BENCH_r*.json.

Baselines are self-established (the reference publishes no numbers,
BASELINE.md) and cached in BENCH_BASELINE.json:
- tokenization: a faithful torch-CPU reimplementation of the reference's
  tokenization path (sequential 512-item batches + cumulative pairwise
  dedup, mirroring modules/tokenizer/semids.py:76-110);
- beam search: the REFERENCE'S OWN modules/model.py generate() executed
  from /root/reference on torch CPU at the flagship geometry (no code is
  copied; the reference tree is imported read-only purely to measure it).

Timing: each pass is synced by fetching values to the host (on remoted TPU
transports block_until_ready can resolve early) and the reported number is
the BEST of N in-process passes — tunnel variance between passes is 2-5x,
so best-of reflects capability rather than tunnel luck (CLAUDE.md).

Geometry = the flagship Amazon-Beauty configs: RQ-VAE 768 -> [512,256,128]
-> 32 with 3 x 256 codebooks (configs/rqvae_amazon.gin); T5 d_model 384 /
6 heads / d_ff 1024 / 4 layers, k=10 beams, bf16 (configs/decoder_amazon.gin).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

QUICK = os.environ.get("RQVAE_TPU_BENCH_QUICK") == "1"  # tiny geometry for suite tests
N_ITEMS = 2048 if QUICK else 65536
INPUT_DIM = 768
HIDDEN = [512, 256, 128]
EMBED = 32
K = 256
L = 3
BEAM_B = 8 if QUICK else 64
BEAM_K = 10
BEAM_CORPUS = 500 if QUICK else 20000
BEAM_SEQ_ITEMS = 20
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
REFERENCE_DIR = "/root/reference"


def _differential_time(run, r1: int = 50, r2: int = 550, reps: int = 5) -> float:
    """Per-iteration device time of `run(r)` (r serially-dependent device
    iterations per call, value-fetch synced): (t(r2) - t(r1)) / (r2 - r1),
    best-of-`reps` per point with the two trip counts INTERLEAVED so a
    congested tunnel window hits both equally. Both calls carry the same
    dispatch + transport RTT, so the difference isolates device compute;
    r2 - r1 is large enough that device compute dominates the tunnel's
    minute-scale RTT jitter. Raises if the slope comes out non-positive
    (drift swamped the measurement) instead of recording a nonsense rate."""
    run(r1)  # warmup both trip counts (same compiled program)
    run(r2)
    t = {r1: float("inf"), r2: float("inf")}
    for _ in range(reps):
        for r in (r1, r2):
            t0 = time.perf_counter()
            run(r)
            t[r] = min(t[r], time.perf_counter() - t0)
    if t[r2] <= t[r1]:
        raise RuntimeError(
            f"differential timing failed: t({r2})={t[r2]:.4f}s <= t({r1})={t[r1]:.4f}s "
            "(transport drift exceeded device compute)"
        )
    return (t[r2] - t[r1]) / (r2 - r1)


def _make_corpus(n=N_ITEMS, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(64, INPUT_DIM) * 2.0
    assign = rng.randint(0, 64, n)
    return (centers[assign] + rng.randn(n, INPUT_DIM) * 0.5).astype(np.float32)


def measure_jax() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
    from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer

    dev = jax.devices()[0]
    cfg = RqVaeConfig(
        input_dim=INPUT_DIM,
        embed_dim=EMBED,
        hidden_dims=tuple(HIDDEN),
        codebook_size=K,
        n_layers=L,
        n_cat_feats=0,
        codebook_mode=QuantizeForwardMode.STE,
    )
    model = RqVae(cfg)
    corpus = _make_corpus()
    x0 = jnp.asarray(corpus[:4096])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x0, 0.2, training=True
    )
    params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, x0)
    tok = SemanticIdTokenizer(model, params, tokenize_batch_size=8192)

    # warmup (compile) with a genuine value fetch
    _np.asarray(tok.precompute_corpus_ids(corpus))

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = tok.precompute_corpus_ids(corpus)
        int(_np.asarray(out[0, 0] + out[-1, -1]))  # per-pass value-fetch sync
        best = min(best, time.perf_counter() - t0)
    res = {
        "items_per_sec": N_ITEMS / best,
        "device": str(dev),
        "seconds_per_pass": best,
    }

    # device-compute throughput: serially-dependent index builds inside one
    # jit, DIFFERENTIALLY timed at two trip counts — (t(R2)-t(R1))/(R2-R1)
    # cancels the per-call transport RTT of the remoted runtime, which can
    # reach hundreds of ms and swamp any single amortized call. On
    # directly-attached TPUs the device number is what production sees.
    # TPU-only: 60 CPU builds would take minutes for no signal.
    if jax.default_backend() == "tpu":
        try:
            build, x = tok._build_index, tok._corpus_dev

            @jax.jit
            def amortized(params, x, r):
                # The serial dependency must be fold-proof: XLA folds
                # integer 0*c / c&0 to constants and then hoists the whole
                # loop-invariant body out of the fori_loop (measured: a
                # "50-iteration" loop timing flat in r). A denormal-scale
                # perturbation of the (small) params by the carried id
                # value is genuinely data-dependent and numerically inert.
                def body(_, c):
                    eps = c.astype(jnp.float32) * jnp.float32(1e-30)
                    p = jax.tree_util.tree_map(lambda w: w + eps.astype(w.dtype), params)
                    out = build(p, x)
                    # consume EVERY column: a carry of out[0, 0] lets XLA
                    # dead-code-eliminate the whole sort-dedup stage
                    return jnp.min(out)

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            per_iter = _differential_time(
                lambda r: float(amortized(params, x, jnp.int32(r)))
            )
            res["device_items_per_sec"] = N_ITEMS / per_iter
        except Exception as e:
            print(f"# amortized tokenization measurement failed: {e}", file=sys.stderr)
    return res


def measure_beam_jax() -> dict:
    """Constrained beam search QPS at the flagship serving config:
    bf16 T5, dense-bitmap prefix trie, B=64 queries/batch."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from rqvae_tpu.data.schemas import TokenizedSeqBatch
    from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
    from rqvae_tpu.serving.beam import build_prefix_table
    from rqvae_tpu.train.decoder_steps import make_generate_fn

    D = L + 1
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, t5_dropout=0.1, top_k_for_generation=BEAM_K,
        t5_dtype="bfloat16",
    )
    model = EncoderDecoderRetrievalModel(cfg)
    rng = np.random.RandomState(0)
    sem = rng.randint(0, K, (BEAM_B, BEAM_SEQ_ITEMS * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, BEAM_B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (BEAM_B, D))),
        seq_mask=jnp.asarray(np.ones((BEAM_B, BEAM_SEQ_ITEMS * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (BEAM_B, BEAM_SEQ_ITEMS))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (BEAM_B, 1))),
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    corpus = jnp.asarray(rng.randint(0, K, (BEAM_CORPUS, L)))
    table = build_prefix_table(corpus, K)
    gen = make_generate_fn(model)
    _np.asarray(gen(params, batch, table).sem_ids)  # compile + warmup

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen(params, batch, table)
        int(_np.asarray(out.sem_ids[0, 0, 0] + out.sem_ids[-1, -1, -1]))
        best = min(best, time.perf_counter() - t0)
    res = {"queries_per_sec": BEAM_B / best, "seconds_per_batch": best}

    # device-compute QPS: serially-dependent generate() calls inside one
    # jit (see benchmarks/beam_amortized.py), differentially timed at two
    # trip counts so the per-call transport RTT cancels — the per-call
    # number above is RTT-dominated on remoted runtimes.
    if jax.default_backend() == "tpu":
        try:

            @jax.jit
            def amortized(params, batch, table, r):
                # fold-proof serial dependency (see the tokenization twin):
                # each iteration queries ids shifted by the previous result
                # mod K — XLA folds `+ 0*c` (int) and hoists the body
                def body(_, c):
                    ids = (batch.sem_ids + jnp.maximum(c, 0)) % K
                    out = model.apply(
                        params,
                        jnp.where(batch.sem_ids >= 0, ids, batch.sem_ids),
                        batch.seq_mask,
                        batch.user_ids,
                        table,
                        None,
                        method=EncoderDecoderRetrievalModel.generate,
                    )
                    return jnp.min(out.sem_ids)

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            per_batch = _differential_time(
                lambda r: int(amortized(params, batch, table, jnp.int32(r)))
            )
            res["device_queries_per_sec"] = BEAM_B / per_batch
        except Exception as e:
            print(f"# amortized beam measurement failed: {e}", file=sys.stderr)
    return res


def measure_train_steps() -> dict:
    """Driver-captured train-step perf + MFU at the flagship Amazon
    geometry (VERDICT r4 Next #3: the 38 ms / 2.4M ex/s numbers previously
    lived only in RESULTS.md self-reports, with no MFU accounting
    anywhere). Differential fori_loop timing — device compute, transport
    RTT cancelled. TPU-only (CPU steps at this geometry are seconds each)."""
    from rqvae_tpu.train.perf import measure_stage1_step, measure_stage2_step

    out = {}
    s1 = measure_stage1_step()  # Amazon geometry defaults, f32 (config default)
    out["stage1_ms_per_step"] = round(s1["seconds_per_step"] * 1e3, 3)
    out["stage1_examples_per_sec"] = round(s1["examples_per_sec"], 1)
    out["stage1_mfu"] = round(s1["mfu"], 4)
    s2 = measure_stage2_step()  # Amazon geometry, bf16 + shipped kernel stack
    out["stage2_ms_per_step"] = round(s2["seconds_per_step"] * 1e3, 3)
    out["stage2_examples_per_sec"] = round(s2["examples_per_sec"], 1)
    out["stage2_mfu"] = round(s2["mfu"], 4)
    return out


def measure_torch_baseline() -> dict:
    """Reference-style tokenization path on torch CPU (written from the
    reference's documented behavior, not copied): MLP encode -> per-level
    L2-argmin quantize -> residual subtract, batches of 512, plus the
    cumulative batch-vs-cache duplicate counting."""
    import torch

    torch.manual_seed(0)
    dims = [INPUT_DIM] + HIDDEN + [EMBED]
    layers = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(torch.nn.Linear(a, b, bias=False))
        if i != len(dims) - 2:
            layers.append(torch.nn.ReLU())
    mlp = torch.nn.Sequential(*layers).eval()
    codebooks = torch.randn(L, K, EMBED)

    corpus = torch.from_numpy(_make_corpus())
    bs = 512

    t0 = time.perf_counter()
    with torch.no_grad():
        cache = None
        for s in range(0, N_ITEMS, bs):
            x = corpus[s : s + bs]
            res = mlp(x)
            ids = []
            for level in range(L):
                cb = codebooks[level]
                d = (res**2).sum(1, keepdim=True) + (cb**2).sum(1)[None, :] - 2 * res @ cb.T
                i = d.argmin(1)
                ids.append(i)
                res = res - cb[i]
            batch_ids = torch.stack(ids, 1)
            # in-batch + batch-vs-cache duplicate counting (semids.py:92-104)
            eq = (batch_ids[:, None, :] == batch_ids[None, :, :]).all(-1)
            hits = torch.tril(eq, diagonal=-1).sum(-1)
            if cache is None:
                cache = batch_ids
            else:
                hits = hits + (batch_ids[:, None, :] == cache[None, :, :]).all(-1).sum(-1)
                cache = torch.cat([cache, batch_ids])
    dt = time.perf_counter() - t0
    return {"items_per_sec": N_ITEMS / dt, "seconds_per_pass": dt}


def measure_torch_beam_baseline() -> dict:
    """The reference's own beam search (modules/model.py:300-410), imported
    read-only from /root/reference and executed on torch CPU at the flagship
    geometry. Nothing is copied into this repo; the reference tree is used
    purely as the measurement target."""
    import torch

    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.model import EncoderDecoderRetrievalModel as RefModel
        from data.schemas import TokenizedSeqBatch as RefBatch
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    D = L + 1
    codebooks = torch.from_numpy(rng.randint(0, K, (BEAM_CORPUS, L))).long()
    model = RefModel(
        codebooks=codebooks,
        num_hierarchies=L,
        num_embeddings_per_hierarchy=K,
        t5_d_model=384,
        t5_num_heads=6,
        t5_d_ff=1024,
        t5_num_layers=4,
        top_k_for_generation=BEAM_K,
        should_add_sep_token=True,
    ).eval()

    sem = rng.randint(0, K, (BEAM_B, BEAM_SEQ_ITEMS * D))
    batch = RefBatch(
        user_ids=torch.from_numpy(rng.randint(0, 1000, BEAM_B)).long(),
        sem_ids=torch.from_numpy(sem).long(),
        sem_ids_fut=torch.from_numpy(rng.randint(0, K, (BEAM_B, D))).long(),
        seq_mask=torch.ones(BEAM_B, BEAM_SEQ_ITEMS * D, dtype=torch.bool),
        token_type_ids=torch.from_numpy(np.tile(np.arange(D), (BEAM_B, BEAM_SEQ_ITEMS))).long(),
        token_type_ids_fut=torch.from_numpy(np.tile(np.arange(D), (BEAM_B, 1))).long(),
    )
    with torch.no_grad():
        model.generate_next_sem_id(batch)  # warmup
        t0 = time.perf_counter()
        model.generate_next_sem_id(batch)
        dt = time.perf_counter() - t0
    return {"queries_per_sec": BEAM_B / dt, "seconds_per_batch": dt}


def _device_healthy(timeout_s: int = 180, attempts: int = 6) -> bool:
    """Probe the default JAX device in a subprocess (the axon TPU tunnel can
    wedge in a way that hangs any in-process call forever). Retries: the
    tunnel refuses new sessions for a few minutes while it tears down a
    just-exited process, and that transient reads as a wedge."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))"
    )
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s, capture_output=True
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < attempts - 1:
            print(f"# device probe attempt {attempt + 1} failed; retrying", file=sys.stderr)
            time.sleep(60)
    return False


def _load_or_establish_baselines() -> dict:
    base = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
    changed = False
    if "items_per_sec" not in base:
        try:
            base.update(measure_torch_baseline())
            base["note"] = (
                "torch-CPU reimplementation of the reference tokenization path "
                f"(sequential 512 batches + cumulative pairwise dedup), N={N_ITEMS}"
            )
            changed = True
        except Exception as e:  # no torch on this host: don't block the metric.
            # In-memory only — persisting the constant would stop torch-capable
            # hosts from ever measuring a real baseline.
            print(f"# tokenization baseline unavailable ({e}); using recorded value", file=sys.stderr)
            base["items_per_sec"] = 1728.0
            base["note"] = "recorded torch-CPU baseline (live measurement unavailable)"
    if "beam_queries_per_sec" not in base and os.path.isdir(REFERENCE_DIR) and not QUICK:
        try:
            beam = measure_torch_beam_baseline()
            base["beam_queries_per_sec"] = beam["queries_per_sec"]
            base["beam_seconds_per_batch"] = beam["seconds_per_batch"]
            base["beam_note"] = (
                "the reference's own modules/model.py generate() on torch CPU, "
                f"B={BEAM_B} k={BEAM_K} corpus={BEAM_CORPUS} d_model=384"
            )
            changed = True
        except Exception as e:  # reference tree or its deps unavailable
            print(f"# beam baseline unavailable: {e}", file=sys.stderr)
    if changed and not QUICK:  # never persist quick-geometry numbers
        with open(BASELINE_FILE, "w") as f:
            json.dump(base, f, indent=2)
    return base


def _force_cpu_backend() -> None:
    """Make the CPU fallback actually land on CPU. The axon PJRT plugin is
    registered by sitecustomize whenever PALLAS_AXON_POOL_IPS is set, and it
    can win device selection even with JAX_PLATFORMS=cpu in the re-exec'd
    process (observed in BENCH_r02.json: "falling back to CPU" followed by a
    TPU v5 device). Belt and braces: the re-exec env drops the axon trigger
    vars (see main), and this asserts/forces via the config API before any
    device touch."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        raise RuntimeError(
            f"CPU fallback failed: backend is {jax.default_backend()!r} after "
            "forcing jax_platforms=cpu"
        )
    print(f"# CPU fallback active: backend={jax.default_backend()}", file=sys.stderr)


def main() -> None:
    wedged = os.environ.get("RQVAE_TPU_BENCH_FORCE_WEDGE") == "1"  # test knob
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and (wedged or not _device_healthy()):
        # accelerator wedged: re-exec on CPU so the driver still gets a line.
        # Drop the axon-plugin trigger vars so sitecustomize never registers
        # the TPU backend in the child — JAX_PLATFORMS=cpu alone is not
        # enough (the plugin overrode it in round 2).
        print("# accelerator unresponsive; falling back to CPU", file=sys.stderr)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("RQVAE_TPU_BENCH_FORCE_WEDGE", None)
        os.execvpe(sys.executable, [sys.executable] + sys.argv, env)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        _force_cpu_backend()

    base = _load_or_establish_baselines()
    ours = measure_jax()
    beam = None
    try:
        beam = measure_beam_jax()
    except Exception as e:
        print(f"# beam measurement failed: {e}", file=sys.stderr)
    train_perf = None
    try:
        import jax as _jax

        if _jax.default_backend() == "tpu":
            train_perf = measure_train_steps()
    except Exception as e:
        print(f"# train-step MFU measurement failed: {e}", file=sys.stderr)

    vs = ours["items_per_sec"] / max(base["items_per_sec"], 1e-9)
    print(
        f"# ours: {ours['items_per_sec']:.0f} items/s on {ours['device']}; "
        f"baseline: {base['items_per_sec']:.0f} items/s (torch CPU)",
        file=sys.stderr,
    )
    headline = {
        "metric": "corpus_tokenization_throughput",
        "value": round(ours["items_per_sec"], 1),
        "unit": "items/sec",
        "vs_baseline": round(vs, 2),
    }
    if "device_items_per_sec" in ours:
        # R serially-dependent builds in one jit: device compute w/o the
        # remote-transport RTT baked into `value`
        headline["device_items_per_sec"] = round(ours["device_items_per_sec"], 1)
    if beam is not None:
        beam_vs = None
        if base.get("beam_queries_per_sec"):
            beam_vs = round(beam["queries_per_sec"] / base["beam_queries_per_sec"], 2)
        beam_line = {
            "metric": "beam_search_throughput",
            "value": round(beam["queries_per_sec"], 1),
            "unit": "queries/sec",
            "vs_baseline": beam_vs,
        }
        if "device_queries_per_sec" in beam:
            beam_line["device_queries_per_sec"] = round(beam["device_queries_per_sec"], 1)
            headline["beam_device_qps"] = round(beam["device_queries_per_sec"], 1)
        print(json.dumps(beam_line))
        headline["beam_qps"] = round(beam["queries_per_sec"], 1)
        headline["beam_vs_baseline"] = beam_vs
    if train_perf is not None:
        # train-step device perf + MFU rows (flagship Amazon geometry;
        # analytic FLOPs model rqvae_tpu/utils/flops.py)
        print(json.dumps({"metric": "train_step_perf", **train_perf}))
        headline.update(train_perf)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
