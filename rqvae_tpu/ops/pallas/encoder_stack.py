"""Pallas TPU kernel: fused T5 encoder-stack forward for long-row serving.

Reference parity surface: the encoder forward inside constrained beam
search (/root/reference/modules/model.py:214-217 runs a HF T5EncoderModel
once per generate()). Our XLA path (models/t5.py::T5Stack) is correct but
round-trips every inter-op activation through HBM: at the ML-32M serving
geometry (B=64, L~=801, d=384) each of the 4 layers streams ~0.9 GB of
[B*L, d]/[B*L, dff] intermediates, and benchmarks/beam_phases.py measures
the encoder at 10.9 ms — 61-73% of that serving batch — against a ~4 ms
compute roofline.

This kernel runs the ENTIRE encoder stack in one pallas_call:

- grid = batch blocks only; all NL layers x H heads unroll inside, so
  intermediates never touch HBM;
- weights and the shared rel-pos bias table are resident in VMEM across
  the batch grid (constant block index -> fetched once);
- the per-row additive key mask arrives as [B, 1, L] and is materialized
  to [bb, L, L] INSIDE the kernel by a rank-1 batched matmul
  (ones[bb, L, 1] @ m[bb, 1, L]) — Mosaic's vector_extract lowering of a
  lazily-broadcast [bb, 1, L] value CHECK-fails under a batch grid
  (bisected in benchmarks/mosaic_repro.py), while batched dots lower
  cleanly;
- rows are padded to a multiple of 8 sublanes OUTSIDE the kernel
  (models/t5.py::T5Stack.fused_encode): padded key columns carry -1e9
  (exact-zero softmax weight), padded query rows compute garbage that the
  caller slices off — valid rows are bit-identical to the unpadded
  program.

Inference only (no dropout, no VJP): training keeps the XLA/fused-
attention path (the attention kernel's win there is the backward).

Shapes (all static; cdt = compute dtype, bf16 or f32):
  x         [B, L, d]         cdt   encoder input embeddings (row-padded)
  wq/wk/wv  [NL, H, d, dk]    cdt   per-head projections (pre-shaped)
  wo        [NL, H, dk, d]    cdt
  wi        [NL, d, dff]      cdt   FFN
  wo2       [NL, dff, d]      cdt
  ln_s/f    [NL, d]           f32   RMSNorm scales (self / ffn)
  ln_final  [1, d]            f32
  bias      [H, L, L]         f32   bidirectional rel-pos bias (block 0's
                                    table, shared by all layers)
  mask      [B, 1, L]         f32   additive key mask (0 / -1e9)
  out       [B, L, d]         f32   ln_final-normalized states
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.ops.pallas.decoder_stack import _rmsnorm

NEG_INF = -1e9


def _kernel(
    num_layers, heads, eps,
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, wi_ref, wo2_ref,
    lns_ref, lnf_ref, lnfin_ref, bias_ref, mask_ref,
    o_ref,
):
    bb, L, d = x_ref.shape
    dk = wq_ref.shape[-1]
    cdt = x_ref.dtype
    x = x_ref[...]  # [bb, L, d]

    # materialize the [bb, L, L] additive key mask via a rank-1 batched
    # matmul (ones @ m): explicit MXU broadcast — the lazy [bb, 1, L]
    # where-broadcast is the exact pattern that CHECK-fails in Mosaic
    mterm = jax.lax.dot_general(
        jnp.ones((bb, L, 1), jnp.float32), mask_ref[...],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bb, L, L]

    def w2(ref, l, h):
        # explicit memory slice + leading-dim reshape (value-level
        # ref[l, h] lowers through vector_extract and CHECK-fails)
        return ref[pl.ds(l, 1), pl.ds(h, 1)].reshape(ref.shape[2], ref.shape[3])

    def bdot(a, b, contract_b=2):
        return jax.lax.dot_general(
            a, b, (((2,), (contract_b,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for l in range(num_layers):
        # ---- self attention (bidirectional, shared rel-pos bias) ----
        xn = _rmsnorm(x.reshape(bb * L, d), lns_ref[pl.ds(l, 1)], eps).astype(cdt)
        attn = jnp.zeros((bb * L, d), jnp.float32)
        for h in range(heads):
            bias_h = bias_ref[pl.ds(h, 1)]  # [1, L, L] broadcasts over bb
            q3 = jnp.dot(xn, w2(wq_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, L, dk)
            k3 = jnp.dot(xn, w2(wk_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, L, dk)
            v3 = jnp.dot(xn, w2(wv_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, L, dk)
            s = bdot(q3, k3) + bias_h + mterm  # [bb, L, L] f32
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            oh = bdot(p, v3, contract_b=1).astype(cdt)  # [bb, L, dk]
            attn = attn + jnp.dot(
                oh.reshape(bb * L, dk), w2(wo_ref, l, h),
                preferred_element_type=jnp.float32,
            )
        x = x + attn.astype(cdt).reshape(bb, L, d)

        # ---- FFN ----
        xn = _rmsnorm(x.reshape(bb * L, d), lnf_ref[pl.ds(l, 1)], eps).astype(cdt)
        wi_l = wi_ref[pl.ds(l, 1)].reshape(wi_ref.shape[1], wi_ref.shape[2])
        wo2_l = wo2_ref[pl.ds(l, 1)].reshape(wo2_ref.shape[1], wo2_ref.shape[2])
        hf = jax.nn.relu(
            jnp.dot(xn, wi_l, preferred_element_type=jnp.float32).astype(cdt)
        )
        ff = jnp.dot(hf, wo2_l, preferred_element_type=jnp.float32).astype(cdt)
        x = x + ff.reshape(bb, L, d)

    y = _rmsnorm(x.reshape(bb * L, d), lnfin_ref[pl.ds(0, 1)], eps)
    o_ref[...] = y.astype(jnp.float32).reshape(bb, L, d)


def _auto_block_b(batch, num_layers, heads, L, dk, d, dff, itemsize,
                  budget=72 * 1024 * 1024):
    """Largest batch block whose working set stays within the VMEM budget.
    Weights + the shared bias have constant block indices (fetched once);
    grid-indexed blocks (x, mask, out) are double-buffered; per-head
    score/prob/mterm scratch counts once."""
    w_bytes = (
        num_layers * (4 * heads * d * dk + 2 * d * dff) * itemsize
        + heads * L * L * 4  # shared rel-pos bias, f32
    )
    per_row = (
        L * d * (itemsize + 4) * 2  # x + f32 out, double-buffered
        + L * L * 4  # materialized mask term
        + L * L * (4 + itemsize)  # score (f32) + prob (cdt) scratch
        + L * dff * itemsize  # FFN hidden
        + 4 * L * max(d, dk) * itemsize  # xn/q/k/v
    )
    for bb in (64, 32, 16, 8, 4, 2, 1):
        if w_bytes + bb * per_row <= budget or bb == 1:
            return min(bb, max(batch, 1))
    return 1


def t5_encoder_stack_infer(
    x: jax.Array,  # [B, L, d] cdt, L a multiple of 8
    wq, wk, wv, wo, wi, wo2,
    ln_s, ln_f, ln_final,
    bias: jax.Array,  # [H, L, L] f32
    mask: jax.Array,  # [B, 1, L] f32 additive (0 / -1e9)
    *,
    eps: float,
    block_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One-dispatch T5 encoder-stack forward (see module docstring)."""
    B, L, d = x.shape
    NL, H, _, dk = wq.shape
    dff = wi.shape[-1]
    assert bias.shape == (H, L, L), bias.shape
    assert mask.shape == (B, 1, L), mask.shape
    if block_b is None:
        block_b = _auto_block_b(B, NL, H, L, dk, d, dff, x.dtype.itemsize)
    nb = pl.cdiv(B, block_b)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec((block_b, L, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((block_b, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    gemm_flops = 2 * B * L * d * (NL * (4 * H * dk + 2 * dff))
    attn_flops = 2 * B * NL * H * L * L * 2 * dk
    return pl.pallas_call(
        functools.partial(_kernel, NL, H, float(eps)),
        grid=(nb,),
        in_specs=[
            xspec,
            const(wq.shape), const(wk.shape), const(wv.shape), const(wo.shape),
            const(wi.shape), const(wo2.shape),
            const(ln_s.shape), const(ln_f.shape), const(ln_final.shape),
            const(bias.shape),
            mspec,
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, L, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=gemm_flops + attn_flops,
            bytes_accessed=B * L * d * (x.dtype.itemsize + 4) + H * L * L * 4,
            transcendentals=B * NL * H * L * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, wq, wk, wv, wo, wi, wo2, ln_s, ln_f, ln_final, bias, mask.astype(jnp.float32))
