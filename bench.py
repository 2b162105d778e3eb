"""Benchmark harness: corpus-tokenization throughput (the BASELINE.json
flagship metric) on the current default JAX device (real TPU when present).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is
self-established: a faithful torch-CPU reimplementation of the reference's
tokenization path (sequential 512-item batches through the MLP encoder +
3-level nearest-codebook quantization + the cumulative pairwise dedup scan,
mirroring modules/tokenizer/semids.py:76-110) measured once on this host
and cached in BENCH_BASELINE.json.

Geometry = the flagship Amazon-Beauty config (configs/rqvae_amazon.gin):
768 -> [512, 256, 128] -> 32, 3 x 256 codebooks.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_ITEMS = 65536
INPUT_DIM = 768
HIDDEN = [512, 256, 128]
EMBED = 32
K = 256
L = 3
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


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

    # warmup (compile) with a genuine value fetch — on remoted runtimes
    # block_until_ready can resolve before execution finishes, so timings
    # MUST sync by pulling a value to the host.
    _np.asarray(tok.precompute_corpus_ids(corpus))

    runs = 5
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(runs):
        out = tok.precompute_corpus_ids(corpus)
        acc = acc + out[0, 0] + out[-1, -1]  # chain a dependency on each pass
    int(_np.asarray(acc))  # single amortized sync
    dt = time.perf_counter() - t0
    ips = N_ITEMS * runs / dt
    return {"items_per_sec": ips, "device": str(dev), "seconds_per_pass": dt / runs}


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


def _device_healthy(timeout_s: int = 180) -> bool:
    """Probe the default JAX device in a subprocess (the axon TPU tunnel can
    wedge in a way that hangs any in-process call forever)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, capture_output=True
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and not _device_healthy():
        # accelerator wedged: re-exec on CPU so the driver still gets a line
        print("# accelerator unresponsive; falling back to CPU", file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.execvpe(sys.executable, [sys.executable] + sys.argv, os.environ)

    ours = measure_jax()

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
    else:
        base = measure_torch_baseline()
        base["note"] = (
            "torch-CPU reimplementation of the reference tokenization path "
            f"(sequential 512 batches + cumulative pairwise dedup), N={N_ITEMS}"
        )
        with open(BASELINE_FILE, "w") as f:
            json.dump(base, f, indent=2)

    vs = ours["items_per_sec"] / max(base["items_per_sec"], 1e-9)
    print(
        f"# ours: {ours['items_per_sec']:.0f} items/s on {ours['device']}; "
        f"baseline: {base['items_per_sec']:.0f} items/s (torch CPU)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "corpus_tokenization_throughput",
                "value": round(ours["items_per_sec"], 1),
                "unit": "items/sec",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
