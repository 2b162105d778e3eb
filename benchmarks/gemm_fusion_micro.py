"""Would fusing the Q/K/V projections into one wide GEMM help?

models/t5.py computes q/k/v as three separate [M, d] @ [d, d] bf16 GEMMs
over the same LHS (self-attention). This micro times, fold-proof
differential:

  3x [M, 384] @ [384, 384]   (current)
  1x [M, 384] @ [384, 1152]  (fused candidate)

at the flagship step geometry M = batch*tokens (Amazon: 640*84 = 53760).
If the fused form wins materially, the param-tree churn (torch interop,
TP specs, checkpoints) might be worth it; if not, this documents why not.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gemm_fusion_micro.py [--m M]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

D = 384


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


def main():
    m = 53760
    if "--m" in sys.argv:
        m = int(sys.argv[sys.argv.index("--m") + 1])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, D), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(3, D, D) * 0.05, jnp.bfloat16)
    wf = jnp.asarray(np.concatenate([np.asarray(w3[i], np.float32) for i in range(3)], 1), jnp.bfloat16)

    def carry_of(y):
        return jnp.maximum(jnp.sum(y.astype(jnp.float32)).astype(jnp.int32), 0) % 7

    @jax.jit
    def run_sep(x, w3, r):
        def body(_, c):
            xv = x + c.astype(x.dtype)
            q = xv @ w3[0]
            k = xv @ w3[1]
            v = xv @ w3[2]
            return carry_of(q) + carry_of(k) + carry_of(v)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    @jax.jit
    def run_fused(x, wf, r):
        def body(_, c):
            y = (x + c.astype(x.dtype)) @ wf
            return carry_of(y)
        return jax.lax.fori_loop(0, r, body, jnp.int32(0))

    t_sep = _slope(lambda r: run_sep(x, w3, r).block_until_ready())
    t_fus = _slope(lambda r: run_fused(x, wf, r).block_until_ready())
    flops = 2 * m * D * 3 * D
    peak = 394e12  # v5e bf16
    print(f"M={m}: separate {t_sep * 1e3:.3f} ms ({flops / t_sep / peak * 100:.1f}% MFU)  "
          f"fused {t_fus * 1e3:.3f} ms ({flops / t_fus / peak * 100:.1f}% MFU)  "
          f"ratio sep/fused = {t_sep / t_fus:.3f}")


if __name__ == "__main__":
    main()
