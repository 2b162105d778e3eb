"""Attention-only micro at the ML-32M encoder shape [B=64, H=6, L~=804,
dk=64]: fused Pallas kernel vs XLA oracle, forward and forward+backward,
differential-timed (fold-proof). Apportions the 55.5 ms/step: how much is
the attention kernel vs everything else (FFN/projections/heads).

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_micro_long.py [L] [--bb N]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _differential_time
from rqvae_tpu.ops.pallas.attention import attention_reference, t5_attention

B, H, DK = 64, 6, 64


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 804
    bb = None
    if "--bb" in sys.argv:
        bb = int(sys.argv[sys.argv.index("--bb") + 1])
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, DK), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, L, DK), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, L, DK), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(H, L, L), jnp.float32)
    mask = jnp.ones((B, L), jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)

    # both arms dropout-free so the comparison apportions matmul/softmax
    # cost symmetrically (pass --drop to measure the fused kernel's
    # in-register dropout increment on its own)
    rate = 0.1 if "--drop" in sys.argv else 0.0

    def fused(qq, kk, vv):
        return t5_attention(qq, kk, vv, bias, mask, seed, dropout_rate=rate, block_b=bb)

    def xla(qq, kk, vv):
        return attention_reference(qq, kk, vv, bias, mask)

    print(f"backend={jax.default_backend()} shape=[{B},{H},{L},{DK}] bb={bb or 'auto'}")
    for name, fn in (("fused", fused), ("xla", xla)):
        def fwd(c):
            eps = (c.astype(jnp.float32) * jnp.float32(1e-30)).astype(q.dtype)
            return jnp.sum(fn(q + eps, k, v).astype(jnp.float32))

        def fwdbwd(c):
            eps = (c.astype(jnp.float32) * jnp.float32(1e-30)).astype(q.dtype)
            g = jax.grad(lambda qq: jnp.sum(fn(qq, k, v).astype(jnp.float32)))(q + eps)
            return jnp.sum(g.astype(jnp.float32))

        for pname, prog in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            @jax.jit
            def amortized(r, prog=prog):
                return jax.lax.fori_loop(
                    0, r, lambda _, c: prog(c), jnp.float32(0.0)
                )

            try:
                per = _differential_time(
                    lambda r: float(amortized(jnp.int32(r))), r1=5, r2=55, reps=4
                )
                print(f"{name:6s} {pname:8s}: {per*1e3:7.2f} ms")
            except Exception as e:
                print(f"{name:6s} {pname:8s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
