"""Encoder-only microbench: fused vs XLA attention across batch sizes.

Measures the TRAIN-path forward (training=True: dropout on, fused kernel
eligible) and the eval/serving forward (training=False: always XLA — the
kernel is gated to training because its win is the backward). `bb=` rows
sweep the forward kernel's batch block (ops/pallas/attention.py
block_b_fwd).

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


def bench(cfg, B, training, block_b_fwd=None):
    import functools
    import rqvae_tpu.ops.pallas.attention as A

    if not hasattr(A, "_orig"):
        A._orig = A.t5_attention
    A.t5_attention = (
        functools.partial(A._orig, block_b_fwd=block_b_fwd)
        if block_b_fwd is not None
        else A._orig
    )
    # the model module imports it lazily inside the call, so patching the
    # module attribute is enough
    import rqvae_tpu.models.t5 as t5mod  # noqa: F401

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, 384), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    enc = T5Stack(cfg)
    params = enc.init(jax.random.PRNGKey(0), x, self_mask=mask)

    @jax.jit
    def amortized(params, x):
        def body(c, _):
            o = enc.apply(
                params,
                x + 0 * c,
                self_mask=mask,
                training=training,
                rngs={"dropout": jax.random.PRNGKey(1)} if training else None,
            )
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
    A.t5_attention = A._orig
    return min(times) / R * 1000, compile_s


def main():
    base = T5StackConfig(d_model=384, d_kv=64, num_heads=6, d_ff=1024, num_layers=4, dropout=0.1)
    for B in (64, 640):
        rows = [
            ("eval  xla", replace(base, fused_attention="off"), False, None),
            ("train xla", replace(base, fused_attention="off"), True, None),
            ("train fused auto", replace(base, fused_attention="on"), True, None),
            ("train fused bb=32", replace(base, fused_attention="on"), True, 32),
            ("train fused bb=64", replace(base, fused_attention="on"), True, 64),
            ("train fused bb=128", replace(base, fused_attention="on"), True, 128),
        ]
        for label, cfg, training, bb in rows:
            ms, comp = bench(cfg, B, training, bb)
            print(f"B={B:4d} {label:18s}: {ms:7.3f} ms/fwd (compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
