"""Pallas TPU kernel: fused MLP-encode + L-level residual quantization.

This is the corpus-tokenization hot path (reference
modules/tokenizer/semids.py:76-110 -> rqvae.py:118-139). The flagship
geometry (768 -> [512,256,128] -> 32, 3x256 codebooks) has an entire weight
stack of ~2.3 MB (f32) plus 98 KB of codebooks — all of it fits in VMEM.
The kernel therefore:

- keeps every weight matrix and codebook resident in VMEM,
- streams corpus rows through the grid in row tiles,
- runs the full chain (matmul -> relu -> ... -> per-level distance matrix ->
  argmin -> one-hot-matmul residual subtract) without touching HBM for any
  intermediate,
- writes only the [rows, L] int32 semantic IDs back.

HBM traffic = one read of the corpus + the id write, so the roofline is
~0.3-0.5 ms for 65k x 768 rows on v5e (100-201 MB at ~800 GB/s, ~80 GFLOP
at bf16 peak). Measured: 0.84 ms device time at block_rows=512
(benchmarks/token_phases.py, fold-proof differential timing — the earlier
2.88 ms record carried the profiling harness's per-iteration dependency-
injection copies) — within ~2x of roofline; the grid's small per-tile
matmuls (contraction dims 128/32 under-fill the MXU) and the VPU
argmin/one-hot epilogue account for the rest. The full index build is
1.75 ms device time (sort-dedup 0.92 ms now dominates) and is transport-
dominated on remoted runtimes.

The residual subtract uses a one-hot matmul (MXU) instead of a row gather,
which Pallas/Mosaic lowers poorly. Distances are always accumulated in
f32; with precision="bf16" the matmuls run in bf16 (2x MXU rate) which can
flip argmin ties — use f32 (default) when exact parity with the XLA path
matters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_weights: int, n_levels: int, precision: str, pack_bits: int, x_ref, *refs):
    # weights/codebooks arrive PRE-CAST to the compute dtype (casting them
    # inside the kernel would repeat the conversion for every grid tile)
    w_refs = refs[:n_weights]
    cb_ref = refs[n_weights]  # [L, K, D] compute dtype
    cb2_ref = refs[n_weights + 1]  # [L, K] f32 squared norms (precomputed)
    out_ref = refs[n_weights + 2]  # [rows, L] int32

    cdtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    h = x_ref[:].astype(cdtype)
    for i in range(n_weights):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        if i != n_weights - 1:
            h = jnp.maximum(h, 0.0).astype(cdtype)
        else:
            h = h.astype(cdtype)

    res = h  # cdtype [rows, D]
    K = cb_ref.shape[1]
    ids_levels = []
    for level in range(n_levels):
        cb = cb_ref[level]  # [K, D] cdtype
        xc = jnp.dot(res, cb.T, preferred_element_type=jnp.float32)
        # argmin over ||res - cb||^2 == argmin over (cb^2 - 2 res.cb)
        dist = cb2_ref[level][None, :] - 2.0 * xc
        ids = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        ids_levels.append(ids)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], K), 1) == ids[:, None]).astype(
            cdtype
        )
        res = (res.astype(jnp.float32) - jnp.dot(onehot, cb, preferred_element_type=jnp.float32)).astype(cdtype)
    cols = list(ids_levels)
    if pack_bits:
        # epilogue pack: the [rows] lexicographic key the dedup sort and the
        # beam-search trie consume — a few VPU ops here instead of a
        # separate XLA pass over the ids
        packed = cols[0]
        for l in range(1, n_levels):
            packed = (packed << pack_bits) | cols[l]
        cols.append(packed)
    out_ref[:] = jnp.stack(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "block_rows", "precision", "interpret", "emit_packed"),
)
def fused_encode_quantize(
    x: jax.Array,  # [N, input_dim], N a multiple of block_rows
    weights: Tuple[jax.Array, ...],  # encoder MLP kernels, in order
    codebooks: jax.Array,  # [L, K, D]
    n_levels: int,
    block_rows: int = 256,
    precision: str = "f32",
    interpret: bool = False,
    emit_packed: bool = False,
) -> jax.Array:
    """Returns [N, L] int32 semantic IDs; with emit_packed=True, [N, L+1]
    whose last column is the lexicographic packed key (ops/dedup.py
    pack_sem_id_tuples semantics, computed in the kernel epilogue)."""
    N, input_dim = x.shape
    assert N % block_rows == 0, (N, block_rows)
    n_weights = len(weights)
    pack_bits = 0
    if emit_packed:
        from rqvae_tpu.ops.dedup import id_bits

        pack_bits = id_bits(codebooks.shape[1])
        assert n_levels * pack_bits <= 31, (n_levels, pack_bits)
    n_cols = n_levels + (1 if emit_packed else 0)

    cdtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    cb_f32 = codebooks.astype(jnp.float32)
    cb2 = jnp.sum(cb_f32 * cb_f32, axis=-1)  # [L, K] f32, once per call
    weights = tuple(w.astype(cdtype) for w in weights)  # once per call
    codebooks_c = codebooks.astype(cdtype)

    grid = (N // block_rows,)
    in_specs = [
        pl.BlockSpec((block_rows, input_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    in_specs.append(
        pl.BlockSpec(codebooks_c.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    )
    in_specs.append(pl.BlockSpec(cb2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, n_weights, n_levels, precision, pack_bits)
    flops_mlp = 2 * N * sum(a.shape[0] * a.shape[1] for a in weights)
    flops_q = 2 * N * n_levels * codebooks.shape[1] * codebooks.shape[2] * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, n_cols), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops_mlp + flops_q,
            bytes_accessed=x.size * x.dtype.itemsize + N * n_cols * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *weights, codebooks_c, cb2)


def encoder_weights_from_params(params) -> Tuple[jax.Array, ...]:
    """Extract the encoder MLP kernels (in forward order) from RqVae params."""
    enc = params["params"]["encoder"]
    names = sorted(enc.keys(), key=lambda s: int(s.split("_")[-1]))
    return tuple(enc[n]["kernel"] for n in names)


def pallas_supported(config) -> bool:
    """The kernel path needs no SimVQ/out-proj and no encoder normalization
    (flagship configs satisfy this; others fall back to the XLA path)."""
    return not config.sim_vq and not config.codebook_normalize
