"""Sub-phase anatomy of the beam-search SCORE stage + top-k alternatives.

beam_phases.py showed one score stage costs ~1.37 ms at B=64 — more than a
full beam-folded decoder forward — and there are three of them per
generate(). This micro splits the stage (head matmul + log_softmax, trie
validity gather, top_k) and A/Bs top-k implementations:

  sort  - jax.lax.top_k (lowers to a full variadic sort on TPU)
  iter  - k rounds of argmax + one-hot mask (VPU reductions, no sort;
          exact, same first-index tie-break as lax.top_k)
  approx- jax.lax.approx_max_k (TPU PartialReduce; approximate)

All fold-proof differential (runtime trip count, slope of two counts).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/score_phases.py [--batch B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rqvae_tpu.serving.beam import (
    build_prefix_table, extend_keys, is_valid_prefix, valid_children)

K, L, D, TOPK = 256, 3, 384, 10
CORPUS = 20000
NEG_INF = -1e9


def _slope(run, r1=50, r2=550, reps=5):
    run(r1)
    run(r2)
    t = {r1: float("inf"), r2: float("inf")}
    for _ in range(reps):
        for r in (r1, r2):
            t0 = time.perf_counter()
            run(r)
            t[r] = min(t[r], time.perf_counter() - t0)
    if t[r2] <= t[r1]:
        raise RuntimeError("non-positive slope")
    return (t[r2] - t[r1]) / (r2 - r1)


def topk_iter(x, k):
    """Exact top-k via k argmax rounds (first-index tie-break, like lax.top_k)."""
    n = x.shape[-1]
    cols = jnp.arange(n, dtype=jnp.int32)

    def body(carry, _):
        idx = jnp.argmax(carry, axis=-1)
        val = jnp.take_along_axis(carry, idx[..., None], axis=-1)[..., 0]
        carry = jnp.where(cols == idx[..., None], -jnp.inf, carry)
        return carry, (val, idx)

    _, (vals, idxs) = jax.lax.scan(body, x, None, length=k)
    return jnp.moveaxis(vals, 0, -1), jnp.moveaxis(idxs, 0, -1)


def main():
    B = 64
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    rng = np.random.RandomState(0)
    corpus_ids = jnp.asarray(rng.randint(0, K, (CORPUS, L)), jnp.int32)
    table = build_prefix_table(corpus_ids, K)
    feat = jnp.asarray(rng.randn(B * TOPK, D), jnp.float32)
    head = jnp.asarray(rng.randn(D, K) * 0.05, jnp.float32)
    parent_keys = jnp.asarray(rng.randint(0, K * K, (B, TOPK)), jnp.int32)
    beam_logp = jnp.asarray(rng.randn(B, TOPK), jnp.float32)

    def carry_of(x):
        return jnp.maximum(jnp.sum(x.astype(jnp.float32)).astype(jnp.int32), 0) % K

    def mm_part(feat, c):
        logits = ((feat + c.astype(feat.dtype)) @ head).reshape(B, TOPK, K)
        return jax.nn.log_softmax(logits, axis=-1)

    def valid_part(logp, parent_keys):
        cand = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), logp.shape)
        keys = extend_keys(table, parent_keys[..., None], cand)
        valid = is_valid_prefix(table, 2, keys)
        return jnp.where(valid, logp, NEG_INF)

    def valid_rows_part(logp, parent_keys):
        child_ok = valid_children(table, 2, parent_keys)[..., :K]
        return jnp.where(child_ok, logp, NEG_INF)

    def bench(name, fn):
        jfn = jax.jit(fn)

        def run(r):
            jfn(jnp.int32(r)).block_until_ready()

        print(f"  {name:18s} {_slope(run) * 1e3:7.3f} ms/iter", flush=True)

    print(f"score phases (B={B}, k={TOPK}, K={K}, n=k*K={TOPK * K}):")

    def f_mm(r):
        def body(_, c):
            return carry_of(mm_part(feat, c))
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    def f_valid(r):
        logp0 = mm_part(feat, jnp.int32(0))
        def body(_, c):
            return carry_of(valid_part(logp0 + c.astype(logp0.dtype), parent_keys))
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    def f_valid_rows(r):
        logp0 = mm_part(feat, jnp.int32(0))
        def body(_, c):
            return carry_of(valid_rows_part(logp0 + c.astype(logp0.dtype), parent_keys))
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    def _f_topk(impl):
        scores0 = valid_part(mm_part(feat, jnp.int32(0)), parent_keys)
        flat0 = (beam_logp[:, :, None] + scores0).reshape(B, TOPK * K)
        def f(r):
            def body(_, c):
                top, idx = impl(flat0 + c.astype(flat0.dtype))
                return carry_of(top) + carry_of(idx)
            return jax.lax.fori_loop(0, r, body, jnp.int32(0))
        return f

    def _f_full(impl, vpart=valid_part):
        def f(r):
            def body(_, c):
                logp = mm_part(feat, c)
                scores = vpart(logp, parent_keys)
                flat = (beam_logp[:, :, None] + scores).reshape(B, TOPK * K)
                top, idx = impl(flat)
                return carry_of(top) + carry_of(idx)
            return jax.lax.fori_loop(0, r, body, jnp.int32(0))
        return f

    sort_impl = lambda x: jax.lax.top_k(x, TOPK)
    iter_impl = lambda x: topk_iter(x, TOPK)
    approx_impl = lambda x: jax.lax.approx_max_k(x, TOPK)

    bench("mm+softmax", f_mm)
    bench("+validity", f_valid)
    bench("+validity:rows", f_valid_rows)
    bench("topk:sort", _f_topk(sort_impl))
    bench("topk:iter", _f_topk(iter_impl))
    try:
        bench("topk:approx", _f_topk(approx_impl))
    except Exception as e:  # approx_max_k may be unsupported on a backend
        print(f"  topk:approx        FAILED ({type(e).__name__})")
    bench("full:sort", _f_full(sort_impl))
    bench("full:iter", _f_full(iter_impl))
    bench("full:rows+sort", _f_full(sort_impl, valid_rows_part))

    # row-gather == per-key scattered lookup
    l0 = mm_part(feat, jnp.int32(0))
    np.testing.assert_array_equal(
        np.asarray(valid_part(l0, parent_keys)),
        np.asarray(valid_rows_part(l0, parent_keys)),
    )
    print("  rows == per-key: True")

    # correctness spot-check (exactness incl. tie-break)
    scores0 = valid_part(mm_part(feat, jnp.int32(0)), parent_keys)
    flat0 = (beam_logp[:, :, None] + scores0).reshape(B, TOPK * K)
    ts, is_ = jax.lax.top_k(flat0, TOPK)
    ti, ii = topk_iter(flat0, TOPK)
    print(f"  iter == sort: vals {bool(jnp.allclose(ts, ti))}, idx {bool((is_ == ii).all())}")


if __name__ == "__main__":
    main()
