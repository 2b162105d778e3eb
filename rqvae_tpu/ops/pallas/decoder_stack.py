"""Pallas TPU kernel: fused T5 decoder-stack forward for beam-search serving.

Reference parity surface: the reference's per-level decoder call inside
constrained beam search (/root/reference/modules/model.py:328-342 runs a
HF T5Stack with a KV cache per level). Our XLA path recomputes the tiny
<=4-token decoder per level (models/t5.py) — correct and cheap in FLOPs,
but the measured cost is DISPATCH, not compute: one decode stage is ~50
XLA ops (4 layers x [3 norms + 8 projections + 2 attention contractions +
softmaxes + residuals]) over tiny [B*k*T, 384] operands, and
benchmarks/beam_phases.py puts it at 0.83 ms against a ~0.44 ms GEMM
floor at the Amazon geometry — 3 stages = ~79% of the serving batch.

This kernel runs the ENTIRE decoder stack in one pallas_call:

- grid = batch blocks only; all NL layers x H heads unroll inside the
  kernel, so intermediates never touch HBM and there is exactly one
  dispatch per decode level;
- weights are resident in VMEM across the batch grid (constant block
  index -> fetched once): ~13.4 MB bf16 at the flagship geometry;
- cross-attention consumes the level-invariant K/V cache computed once
  per generate() (models/t5.py::T5Stack.cross_kv) — the encoder output is
  never re-projected;
- self-attention over the k beams of one query runs BEAM-FOLDED, like the
  XLA path's cross-attention: the [k*T] rows of one batch element attend
  jointly with a static block-diagonal (+causal +rel-bias) additive mask,
  so each head is ONE [kT, dk] x [kT, dk] batched contraction instead of
  k tiny ones. exp(-1e9 - max) underflows to exactly 0.0 in f32, so the
  folded softmax is bit-identical to the per-beam one;
- per-head weight slices are pre-shaped OUTSIDE the kernel
  ([d, H*dk] -> [H, d, dk]), so the kernel never slices the lane
  dimension at a sub-tile (64) offset.

Inference only (no dropout, no VJP): the serving gate in models/t5.py
routes training to the fused attention kernel/XLA instead.

Shapes (all static; cdt = compute dtype, bf16 or f32):
  x         [B, kT, d]        cdt   beam-folded input embeddings (kT = beams*T)
  wq/wk/wv  [NL, H, d, dk]    cdt   self-attention projections, per head
  wo        [NL, H, dk, d]    cdt
  cq        [NL, H, d, dk]    cdt   cross-attention query projection
  co        [NL, H, dk, d]    cdt
  wi        [NL, d, dff]      cdt   FFN
  wo2       [NL, dff, d]      cdt
  ln_s/c/f  [NL, d]           f32   RMSNorm scales (self / cross / ffn)
  ln_final  [1, d]            f32
  bias_fold [H, kT, kT]       f32   rel-pos bias + causal + cross-beam -inf
  kc, vc    [NL, B, H, Le, dk] cdt  cross K/V cache (T5Stack.cross_kv)
  mask_term [B, kT, Le]       f32   additive cross-attention mask (0 or
                                    -1e9), pre-broadcast OUTSIDE the
                                    kernel: Mosaic's vector_extract of a
                                    lazily-broadcast [bb, 1, Le] value
                                    CHECK-fails under a batch grid
                                    (bisected in benchmarks/mosaic_repro.py)
  out       [B, kT, d]        f32   ln_final-normalized states (all positions;
                                    the caller slices each beam's last row)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _rmsnorm(x2, w2, eps):
    """RMSNorm on [M, d] with scale [1, d] (f32 math, scale applied in f32
    — mirrors models/t5.py::RMSNorm incl. its cast-back-to-input-dtype
    point; kept 2-D throughout for Mosaic)."""
    xf = x2.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x2.dtype) * w2


def _kernel(
    num_layers, heads, eps,
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, cq_ref, co_ref, wi_ref, wo2_ref,
    lns_ref, lnc_ref, lnf_ref, lnfin_ref, bias_ref, kc_ref, vc_ref, mask_ref,
    o_ref,
):
    bb, kt, d = x_ref.shape
    dk = wq_ref.shape[-1]
    le = kc_ref.shape[-2]
    cdt = x_ref.dtype
    x = x_ref[...]  # [bb, kT, d]
    mterm = mask_ref[...]  # [bb, kT, Le] f32 additive (pre-broadcast)

    # all static indexing below goes through explicit memory slices
    # (pl.ds + leading-dim reshape): value-level extracts like wq_ref[l, h]
    # lower through Mosaic's vector_extract path, which CHECK-fails on
    # collapsed leading dims at small kT (found on real-chip compile;
    # interpret mode cannot see it)
    def w2(ref, l, h):
        return ref[pl.ds(l, 1), pl.ds(h, 1)].reshape(ref.shape[2], ref.shape[3])

    def bdot(a, b, contract_b=2):
        # [bb, m, c] x [bb, n, c] -> [bb, m, n] (contract_b=2)
        # [bb, m, n] x [bb, n, c] -> [bb, m, c] (contract_b=1)
        return jax.lax.dot_general(
            a, b, (((2,), (contract_b,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for l in range(num_layers):
        # ---- self attention (beam-folded, block-diag causal bias) ----
        xn = _rmsnorm(x.reshape(bb * kt, d), lns_ref[pl.ds(l, 1)], eps).astype(cdt)
        attn = jnp.zeros((bb * kt, d), jnp.float32)
        for h in range(heads):
            bias_h = bias_ref[pl.ds(h, 1)]  # [1, kT, kT] broadcasts over bb
            q3 = jnp.dot(xn, w2(wq_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, kt, dk)
            k3 = jnp.dot(xn, w2(wk_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, kt, dk)
            v3 = jnp.dot(xn, w2(wv_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, kt, dk)
            s = bdot(q3, k3) + bias_h  # [bb, kT, kT] f32
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            oh = bdot(p, v3, contract_b=1).astype(cdt)  # [bb, kT, dk]
            attn = attn + jnp.dot(
                oh.reshape(bb * kt, dk), w2(wo_ref, l, h),
                preferred_element_type=jnp.float32,
            )
        x = x + attn.astype(cdt).reshape(bb, kt, d)

        # ---- cross attention against the resident K/V cache ----
        xn = _rmsnorm(x.reshape(bb * kt, d), lnc_ref[pl.ds(l, 1)], eps).astype(cdt)
        catt = jnp.zeros((bb * kt, d), jnp.float32)
        for h in range(heads):
            kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, le, dk)
            vch = vc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, le, dk)
            q3 = jnp.dot(xn, w2(cq_ref, l, h), preferred_element_type=jnp.float32
                         ).astype(cdt).reshape(bb, kt, dk)
            s = bdot(q3, kch) + mterm  # [bb, kT, Le] f32
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            oh = bdot(p, vch, contract_b=1).astype(cdt)
            catt = catt + jnp.dot(
                oh.reshape(bb * kt, dk), w2(co_ref, l, h),
                preferred_element_type=jnp.float32,
            )
        x = x + catt.astype(cdt).reshape(bb, kt, d)

        # ---- FFN ----
        xn = _rmsnorm(x.reshape(bb * kt, d), lnf_ref[pl.ds(l, 1)], eps).astype(cdt)
        wi_l = wi_ref[pl.ds(l, 1)].reshape(wi_ref.shape[1], wi_ref.shape[2])
        wo2_l = wo2_ref[pl.ds(l, 1)].reshape(wo2_ref.shape[1], wo2_ref.shape[2])
        hf = jax.nn.relu(
            jnp.dot(xn, wi_l, preferred_element_type=jnp.float32).astype(cdt)
        )
        ff = jnp.dot(hf, wo2_l, preferred_element_type=jnp.float32).astype(cdt)
        x = x + ff.reshape(bb, kt, d)

    y = _rmsnorm(x.reshape(bb * kt, d), lnfin_ref[pl.ds(0, 1)], eps)
    o_ref[...] = y.astype(jnp.float32).reshape(bb, kt, d)


def _auto_block_b(batch, num_layers, heads, kt, le, dk, d, dff, itemsize,
                  budget=72 * 1024 * 1024):
    """Largest batch block whose double-buffered working set (cross K/V
    cache + x/out) plus the resident weights stays within the VMEM budget.
    Weights have a constant block index (fetched once), so they count once;
    per-batch-row blocks count twice (pipeline double buffering).

    Mosaic's TRUE scoped allocation exceeds this analytic minimum by an
    Le-dependent factor (it keeps more per-layer/per-head temporaries live
    across the unrolled loops): at Le=256/bb=16 the model said 69MB but the
    compiler allocated 110.8MB and failed the 100MB limit
    (benchmarks/r4_tpu_session2.py). Rather than guess the factor, the
    block pick is additionally capped by the CHIP-PROVEN fit table below.
    Every cap compiled and ran on v5e (r4 sessions) WITH HEADROOM: bb=32 at
    Le=128 compiled standalone (119.75M true allocation) but OOM'd when the
    kernel sits inside the fused Retriever query program, whose surrounding
    scratch lowers the effective scoped-vmem ceiling (116M observed) — so
    the Le<=128 cap is 16, half the standalone-proven block."""
    w_bytes = num_layers * (6 * heads * d * dk + 2 * d * dff) * itemsize
    per_row = (
        num_layers * 2 * heads * le * dk * itemsize  # kc + vc
        + kt * d * (itemsize + 4)  # x + f32 out
        + kt * le * 4  # pre-broadcast mask term (f32)
        + 2 * kt * max(kt, le) * 4  # score/prob scratch (f32)
    )
    cap = 16 if le <= 128 else (8 if le <= 512 else 4)
    for bb in (64, 32, 16, 8, 4, 2, 1):
        if bb > cap:
            continue
        if w_bytes + 2 * bb * per_row <= budget or bb == 1:
            return min(bb, max(batch, 1))
    return 1


def t5_decoder_stack_infer(
    x: jax.Array,  # [B, kT, d] cdt
    wq, wk, wv, wo, cq, co, wi, wo2,
    ln_s, ln_c, ln_f, ln_final,
    bias_fold: jax.Array,  # [H, kT, kT] f32
    kc: jax.Array,  # [NL, B, H, Le, dk] cdt
    vc: jax.Array,
    mask_term: jax.Array,  # [B, kT, Le] f32 additive (0 / -1e9)
    *,
    eps: float,
    block_b: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One-dispatch T5 decoder-stack forward (see module docstring)."""
    B, kt, d = x.shape
    NL, H, _, dk = wq.shape
    dff = wi.shape[-1]
    le = kc.shape[3]
    assert kc.shape == (NL, B, H, le, dk) and vc.shape == kc.shape
    assert bias_fold.shape == (H, kt, kt), bias_fold.shape
    assert mask_term.shape == (B, kt, le), mask_term.shape
    if block_b is None:
        block_b = _auto_block_b(B, NL, H, kt, le, dk, d, dff, x.dtype.itemsize)
    nb = pl.cdiv(B, block_b)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec((block_b, kt, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec(
        (NL, block_b, H, le, dk), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec((block_b, kt, le), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((block_b, kt, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    gemm_flops = 2 * B * kt * d * (NL * (6 * H * dk + 2 * dff))
    attn_flops = 2 * B * NL * H * kt * (kt + le) * 2 * dk
    return pl.pallas_call(
        functools.partial(_kernel, NL, H, float(eps)),
        grid=(nb,),
        in_specs=[
            xspec,
            const(wq.shape), const(wk.shape), const(wv.shape), const(wo.shape),
            const(cq.shape), const(co.shape), const(wi.shape), const(wo2.shape),
            const(ln_s.shape), const(ln_c.shape), const(ln_f.shape),
            const(ln_final.shape), const(bias_fold.shape),
            kvspec, kvspec, mspec,
        ],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, kt, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=gemm_flops + attn_flops,
            bytes_accessed=(
                B * kt * d * (x.dtype.itemsize + 4)
                + 2 * NL * B * H * le * dk * x.dtype.itemsize
            ),
            transcendentals=B * NL * H * kt * (kt + le),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, wq, wk, wv, wo, cq, co, wi, wo2,
        ln_s, ln_c, ln_f, ln_final, bias_fold,
        kc, vc, mask_term.astype(jnp.float32),
    )
