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

    # candidate v1: ONE fused lax.sort returns sorted keys AND the
    # permutation (argsort then keys[order] pays a separate gather)
    def dedup_v1(keys):
        n = keys.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_keys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
        idx = jnp.arange(n)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, idx, 0))
        rank = (idx - seg_start).astype(jnp.int32)
        return jnp.zeros(n, jnp.int32).at[order].set(rank)

    # candidate v2: v1 but the inverse permutation via a SECOND sort
    # instead of a scatter (XLA-TPU scatter vs vectorized sort)
    def dedup_v2(keys):
        n = keys.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_keys, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
        idx = jnp.arange(n)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, idx, 0))
        rank = (idx - seg_start).astype(jnp.int32)
        _, back = jax.lax.sort((order, rank), num_keys=1, is_stable=False)
        return back

    for name, fn in (("dedup_v1_fused_sort", dedup_v1),
                     ("dedup_v2_sort_inverse", dedup_v2)):
        @jax.jit
        def run_v(keys, r, fn=fn):
            def body(_, c):
                d = fn(keys ^ (c & 0x7))
                return jnp.max(d) + c
            return jax.lax.fori_loop(0, r, body, jnp.int32(0))

        results[name] = differential(lambda r: int(run_v(keys0, jnp.int32(r))))

    # correctness guard for the candidates (CPU/TPU alike)
    from rqvae_tpu.ops.dedup import dedup_counts_from_keys as base
    ref = np.asarray(base(keys0))
    for name, fn in (("v1", dedup_v1), ("v2", dedup_v2)):
        got = np.asarray(jax.jit(fn)(keys0))
        assert (got == ref).all(), f"{name} mismatch"
    print("candidates match baseline output", flush=True)

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
