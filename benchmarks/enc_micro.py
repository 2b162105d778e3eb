"""Encoder-only microbench: fused vs XLA attention across batch sizes.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/enc_micro.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import replace

from rqvae_tpu.models.t5 import T5Stack, T5StackConfig

L = 80
R = 50


def bench(cfg, B, block_b=None):
    if block_b is not None:
        import functools
        import rqvae_tpu.ops.pallas.attention as A

        if not hasattr(A, "_orig"):
            A._orig = A.t5_attention
        A.t5_attention = functools.partial(A._orig, block_b=block_b)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, 384), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    enc = T5Stack(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, self_mask=mask)

    @jax.jit
    def amortized(params, x):
        def body(c, _):
            o = enc.apply(params, x + 0 * c, self_mask=mask)
            return o.mean().astype(jnp.bfloat16), None

        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=R)
        return c

    t0 = time.perf_counter()
    float(amortized(params, x))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(amortized(params, x))
        times.append(time.perf_counter() - t0)
    return min(times) / R * 1000, compile_s


def main():
    base = T5StackConfig(d_model=384, d_kv=64, num_heads=6, d_ff=1024, num_layers=4, dropout=0.1)
    for B in (64, 640):
        for label, cfg, bb in (
            ("off", replace(base, fused_attention="off"), None),
            ("on b=auto", replace(base, fused_attention="on"), None),
            ("on b=8", replace(base, fused_attention="on"), 8),
        ):
            ms, comp = bench(cfg, B, bb)
            print(f"B={B:4d} {label:10s}: {ms:7.3f} ms/fwd (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
