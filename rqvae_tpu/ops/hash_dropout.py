"""Counter-based dropout with a mask-free backward pass.

Reference parity surface: plain `nn.Dropout` as HF T5 applies it (input,
residual, FFN-inner and final dropouts; reference builds stock HF T5
stacks, /root/reference/modules/model.py:77-96).

Why not `flax.linen.Dropout`: its mask is drawn with a stateful-PRNG
custom call and then SAVED as an autodiff residual — at the flagship
stage-2 geometry the mask tensors are ~0.6 Gbit/step of HBM traffic,
measured at 13.3 ms/step (RESULTS.md round 2) even on the hardware `rbg`
generator. Here the keep-mask is a murmur3-finalizer hash of (seed, global
element position):

- it is plain integer elementwise math on an iota, so XLA fuses it into the
  surrounding elementwise chain — the mask never exists in HBM;
- the custom VJP recomputes the identical mask from the seed in the
  backward pass, so the ONLY residual is the int32 seed scalar;
- it is deterministic per (seed, shape), independent of device layout, and
  works identically on CPU/TPU and under GSPMD sharding (iota is global).

Statistical caveat: this is a hash, not a cryptographic PRNG — more than
adequate for dropout (the same class of generator as `rbg`/Philox).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def hash_keep_bits(counter: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """Murmur3-finalizer keep decision for uint32 element `counter`s: hash
    (counter XOR seed*golden) and keep iff bits >= rate * 2^32. The SINGLE
    definition shared by hash_dropout, the fused attention kernel's
    in-register dropout (forward AND backward regenerate identical bits
    from it), and the oracle tests — plain uint32 elementwise ops, legal
    inside Pallas kernels.

    `seed` must be a SCALAR array: no asarray/reshape here — a scalar
    reshape inside a Pallas kernel trips a Mosaic vector.broadcast
    lowering error on compiled TPU (interpret mode does not catch it)."""
    x = counter ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(round(rate * 2**32)), 2**32 - 1))
    return x >= thresh


def keep_mask(seed: jax.Array, shape, rate: float) -> jax.Array:
    """[shape] bool keep-mask: hash_keep_bits of the linear element index."""
    if math.prod(shape) >= 2**32:
        raise ValueError(
            f"keep_mask over {shape}: {math.prod(shape)} elements overflows the "
            "uint32 linear counter (masks would silently repeat)"
        )
    x = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] > 1:
            x = x + jax.lax.broadcasted_iota(jnp.uint32, shape, d) * jnp.uint32(stride)
        stride *= shape[d]
    return hash_keep_bits(x, jnp.asarray(seed).reshape(()), rate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """Dropout(x) with keep probability 1-rate, scaled by 1/(1-rate)."""
    keep = keep_mask(seed, x.shape, rate)
    return jnp.where(keep, x, 0).astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate), x.dtype)


def _fwd(x, seed, rate):
    return hash_dropout(x, seed, rate), seed


def _bwd(rate, seed, g):
    keep = keep_mask(seed, g.shape, rate)
    dx = jnp.where(keep, g, 0).astype(g.dtype) * jnp.asarray(1.0 / (1.0 - rate), g.dtype)
    return dx, np.zeros(jnp.shape(seed), jax.dtypes.float0)


hash_dropout.defvjp(_fwd, _bwd)


def dropout_seed(rng: jax.Array) -> jax.Array:
    """Derive an int32 scalar seed from a PRNG key (one cheap scalar draw)."""
    return jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
