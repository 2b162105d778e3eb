"""Index-build dedup-sort stage: attack-or-bound measurement (VERDICT r4
Next #6). The 65k-item device index build is 1.75 ms, of which the
sort-based dedup (ops/dedup.py::dedup_counts_from_keys) is ~0.92 ms.

Measures, fold-proof differential timing on the chip:
  a) full index build (tok._build_index) — the production number
  b) dedup_counts_from_keys alone (argsort stable + scan + scatter)
  c) the raw stable two-operand sort alone (the lower bound any
     sort-based dedup pays under XLA)
  d) sort of keys WITHOUT payload (what a hypothetical payload-free
     algorithm would pay)
  e) dedup_counts_dense (histogram alternative; known slower at 16.7M bins)

Usage: PYTHONPATH=/root/repo python benchmarks/dedup_sort_micro.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def differential(run, r1=50, r2=550, reps=5):
    run(r1); run(r2)
    t = {r1: float("inf"), r2: float("inf")}
    for _ in range(reps):
        for r in (r1, r2):
            t0 = time.perf_counter()
            run(r)
            t[r] = min(t[r], time.perf_counter() - t0)
    if t[r2] <= t[r1]:
        raise RuntimeError(f"drift: t({r2})={t[r2]} <= t({r1})={t[r1]}")
    return (t[r2] - t[r1]) / (r2 - r1)


def main():
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.ops.dedup import dedup_counts_from_keys, dedup_counts_dense

    N, K, L = 65536, 256, 3
    rng = np.random.RandomState(0)
    # realistic key distribution: clustered tuples (many duplicates), 24-bit
    base = rng.randint(0, 1 << 24, 4096)
    keys0 = jnp.asarray(base[rng.randint(0, len(base), N)], jnp.int32)

    print(f"backend={jax.default_backend()}  N={N}", flush=True)
    results = {}

    @jax.jit
    def run_dedup(keys, r):
        def body(_, c):
            k = keys ^ (c & 0x7)  # data-dependent, numerically trivial
            d = dedup_counts_from_keys(k)
            return jnp.max(d) + c
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    results["dedup_counts_from_keys"] = differential(
        lambda r: int(run_dedup(keys0, jnp.int32(r))))

    @jax.jit
    def run_sort2(keys, r):
        iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
        def body(_, c):
            k = keys ^ (c & 0x7)
            sk, si = jax.lax.sort((k, iota), num_keys=1, is_stable=True)
            return sk[0] + si[-1] + c
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    results["stable_sort_key+payload"] = differential(
        lambda r: int(run_sort2(keys0, jnp.int32(r))))

    @jax.jit
    def run_sort1(keys, r):
        def body(_, c):
            k = keys ^ (c & 0x7)
            sk = jax.lax.sort(k, is_stable=False)
            return sk[0] + sk[-1] + c
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    results["unstable_sort_key_only"] = differential(
        lambda r: int(run_sort1(keys0, jnp.int32(r))))

    try:
        @jax.jit
        def run_dense(keys, r):
            def body(_, c):
                k = keys ^ (c & 0x7)
                d = dedup_counts_dense(k, key_space=1 << 24)
                return jnp.max(d) + c
            return jax.lax.fori_loop(0, r, body, jnp.int32(0))

        results["dedup_counts_dense_16.7Mbins"] = differential(
            lambda r: int(run_dense(keys0, jnp.int32(r))), r1=5, r2=25, reps=3)
    except Exception as e:
        print(f"dense variant failed: {e}", flush=True)

    print("\n| variant | ms |")
    print("|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v * 1e3:.3f} |")

    import json
    print(json.dumps({k: v * 1e3 for k, v in results.items()}))


if __name__ == "__main__":
    main()
