"""Pallas TPU kernel: fused T5 attention — softmax(QK^T + bias + mask) @ V
with in-register dropout.

Reference parity surface: HF T5's attention as used by the reference
retrieval model (/root/reference/modules/model.py:77-96 builds T5 stacks;
T5 applies no 1/sqrt(d) score scaling, adds a relative-position bias shared
across the batch, masks padding, applies dropout to the softmax weights).

Why a kernel: the XLA path (models/t5.py) materializes the [B, H, Lq, Lk]
f32 score tensor in HBM several times per layer (scores write, +bias,
softmax, dropout-mask generation, dropped-weights write, PV read). At the
flagship stage-2 geometry (B=640, H=6, Lq=Lk~=84) that tensor is ~108 MB
and the measured train step is elementwise/HBM-bound (~18% MFU — see
RESULTS.md round 2). Here the whole attention row block stays in VMEM:

- HBM traffic = one read of Q/K/V + bias/mask, one write of O;
- dropout bits are a counter-based hash (murmur3 finalizer) of the global
  element coordinate, computed in-register and never touching HBM —
  forward and backward regenerate the SAME bits from the same seed;
- the backward kernel recomputes softmax exactly (whole rows fit in VMEM,
  so no saved lse/max stats are needed — flash-attention style) and also
  accumulates the relative-position-bias gradient across the batch grid.

Shapes (all static):
  q       [B, H, Lq, dk]   compute dtype (bf16/f32)
  k, v    [B, H, Lk, dk]
  bias    [H, Lq, Lk]      f32 (pass zeros when there is no position bias)
  mask    [B, Lk]          int32, 1 = attend (pass ones when unmasked)
  seed    [1]              int32 (ignored when dropout_rate == 0)
  out     [B, H, Lq, dk]   q.dtype

Grid = (H, B-blocks): the batch dimension is the inner, sequentially-
iterated ("arbitrary") axis so the dbias output block for head h stays
resident in VMEM while the batch streams through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _dropout_keep(shape, dropout_rate: float, seed, h, b0, heads: int, lq: int, lk: int):
    """Counter-based keep-mask: `hash_keep_bits` (ops/hash_dropout.py — the
    single shared finalizer definition) of the GLOBAL element coordinate.
    Because the counter is the logical (batch, head, q, k) position — not
    anything block-relative — forward and backward regenerate identical
    masks by construction, for any block size, in both compiled and
    interpret modes (the hardware `pltpu.prng_*` path has no interpreter
    support in this JAX version)."""
    from rqvae_tpu.ops.hash_dropout import hash_keep_bits

    bi = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + b0).astype(jnp.uint32)
    qi = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    kj = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    x = ((bi * jnp.uint32(heads) + jnp.uint32(h)) * jnp.uint32(lq) + qi) * jnp.uint32(lk) + kj
    return hash_keep_bits(x, seed, dropout_rate)


def _scores(q, k, bias, mask, causal: bool):
    """[Bt, Lq, Lk] f32 masked scores for one head / batch block."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s + bias[None]
    s = s + jnp.where(mask[:, None, :] != 0, 0.0, NEG_INF)
    if causal:
        lq, lk = s.shape[1], s.shape[2]
        ci = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        s = s + jnp.where(cj <= ci, 0.0, NEG_INF)[None]
    return s


def _fwd_kernel(causal, dropout_rate, seed_ref, q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    h, b = pl.program_id(0), pl.program_id(1)
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]  # [Bt, L, dk]
    p = jax.nn.softmax(_scores(q, k, bias_ref[0], mask_ref[:, 0], causal), axis=-1)
    if dropout_rate > 0.0:
        heads, lq, lk = pl.num_programs(0), p.shape[1], p.shape[2]
        keep = _dropout_keep(p.shape, dropout_rate, seed_ref[0], h, b * p.shape[0], heads, lq, lk)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    causal, dropout_rate, batch, seed_ref,
    q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
):
    h, b = pl.program_id(0), pl.program_id(1)
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]
    do = do_ref[:, 0].astype(jnp.float32)  # [Bt, Lq, dk]

    # exact softmax recompute (identical masking path to the forward)
    p = jax.nn.softmax(_scores(q, k, bias_ref[0], mask_ref[:, 0], causal), axis=-1)
    if dropout_rate > 0.0:
        heads, lq, lk = pl.num_programs(0), p.shape[1], p.shape[2]
        # same (seed, global coordinate) => identical bits to the forward
        keep = _dropout_keep(p.shape, dropout_rate, seed_ref[0], h, b * p.shape[0], heads, lq, lk)
        scale = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p, 0.0) * scale
    else:
        pd = p

    cdt = q.dtype
    # dV = Pd^T @ dO   — contract over Lq
    dv = jax.lax.dot_general(
        pd.astype(cdt), do.astype(cdt), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dPd = dO @ V^T
    dpd = jax.lax.dot_general(
        do.astype(cdt), v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dpd, 0.0) * scale
    else:
        dp = dpd
    # softmax VJP: dS = P * (dP - sum(dP * P, axis=-1))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    # zero grid-edge garbage rows before the cross-batch dbias accumulation
    bt = q.shape[0]
    bidx = b * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1), 0)
    ds = jnp.where(bidx < batch, ds, 0.0)

    ds_c = ds.astype(cdt)
    dq = jax.lax.dot_general(
        ds_c, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds_c, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[:, 0] = dq.astype(dq_ref.dtype)
    dk_ref[:, 0] = dk.astype(dk_ref.dtype)
    dv_ref[:, 0] = dv.astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    dbias_ref[0] = dbias_ref[0] + jnp.sum(ds, axis=0)


def _specs(batch, heads, lq, lk, dk, block_b):
    nb = pl.cdiv(batch, block_b)
    grid = (heads, nb)
    qspec = pl.BlockSpec((block_b, 1, lq, dk), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((block_b, 1, lk, dk), lambda h, b: (b, h, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, lq, lk), lambda h, b: (h, 0, 0), memory_space=pltpu.VMEM)
    # mask travels as [B, 1, Lk]: with the batch block OUTSIDE the last two
    # dims, Mosaic's (8, 128)-divisibility rule on block shapes is satisfied
    # for ANY block_b — a 2-D [B, Lk] spec with block (2, lk) fails to lower
    # at the long-sequence geometry (block_b floors at 2 there; found on
    # real-chip compile, invisible to interpret mode)
    mask_spec = pl.BlockSpec((block_b, 1, lk), lambda h, b: (b, 0, 0), memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return grid, qspec, kspec, bias_spec, mask_spec, seed_spec


def _cost(batch, heads, lq, lk, dk, n_matmuls):
    return pl.CostEstimate(
        flops=2 * batch * heads * lq * lk * dk * n_matmuls,
        bytes_accessed=batch * heads * (lq + 2 * lk + lq) * dk * 2 + heads * lq * lk * 4,
        transcendentals=batch * heads * lq * lk,
    )


def _fwd_call(causal, dropout_rate, block_b, interpret, q, k, v, bias, mask, seed):
    batch, heads, lq, dk = q.shape
    lk = k.shape[2]
    grid, qspec, kspec, bias_spec, mask_spec, seed_spec = _specs(batch, heads, lq, lk, dk, block_b)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, causal, dropout_rate),
        grid=grid,
        in_specs=[seed_spec, qspec, kspec, kspec, bias_spec, mask_spec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=_cost(batch, heads, lq, lk, dk, 2),
        compiler_params=pltpu.CompilerParams(
            # no cross-step accumulation in the forward: both dims parallel
            # so megacore can split the grid freely
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, q, k, v, bias, mask)


def _bwd_call(causal, dropout_rate, block_b, interpret, q, k, v, bias, mask, seed, do):
    batch, heads, lq, dk = q.shape
    lk = k.shape[2]
    grid, qspec, kspec, bias_spec, mask_spec, seed_spec = _specs(batch, heads, lq, lk, dk, block_b)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, causal, dropout_rate, batch),
        grid=grid,
        in_specs=[seed_spec, qspec, kspec, kspec, bias_spec, mask_spec, qspec],
        out_specs=(qspec, kspec, kspec, bias_spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        cost_estimate=_cost(batch, heads, lq, lk, dk, 5),
        compiler_params=pltpu.CompilerParams(
            # batch must iterate sequentially: the dbias block for head h is
            # revisited (accumulated into) across consecutive b steps
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, q, k, v, bias, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_attention(causal, dropout_rate, block_b_fwd, block_b_bwd, interpret, q, k, v, bias, mask, seed):
    return _fwd_call(causal, dropout_rate, block_b_fwd, interpret, q, k, v, bias, mask, seed)


def _fused_fwd(causal, dropout_rate, block_b_fwd, block_b_bwd, interpret, q, k, v, bias, mask, seed):
    out = _fwd_call(causal, dropout_rate, block_b_fwd, interpret, q, k, v, bias, mask, seed)
    return out, (q, k, v, bias, mask, seed)


def _fused_bwd(causal, dropout_rate, block_b_fwd, block_b_bwd, interpret, res, do):
    q, k, v, bias, mask, seed = res
    dq, dk, dv, dbias = _bwd_call(
        causal, dropout_rate, block_b_bwd, interpret, q, k, v, bias, mask, seed, do
    )
    f0 = jax.dtypes.float0
    return dq, dk, dv, dbias, np.zeros(mask.shape, f0), np.zeros(seed.shape, f0)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def _auto_block_b(batch, lq, lk, dk, n_score_bufs=3, budget=12 * 1024 * 1024):
    """Largest batch block whose working set (`n_score_bufs` f32 [Lq, Lk]
    score-shaped tensors + q/k/v/do bf16, double-buffered) stays within the
    VMEM budget. Backward (scores/P/dS, n_score_bufs=3, 12MB) measured at
    the flagship stage-2 geometry (Lq=Lk=80, dk=64): 32 -> 38.1 ms/step vs
    8 -> 39.4 (benchmarks/ab_stage2_step.py). The forward holds only
    scores/P and gets a larger budget (fewer, bigger grid steps).

    When even block 2 busts the budget (the long-row regime, e.g. the
    804-token ML-32M rows), floor at 4 instead as long as it physically
    fits under the kernel's vmem_limit: measured at L=804 (RESULTS.md r3),
    block 4 beats 2 on BOTH passes (fwd 1.35 -> 1.29 ms, bwd 1.68 -> 1.61)
    and 8 is worse for the backward."""
    per_row = n_score_bufs * lq * lk * 4 + 2 * (lq + 3 * lk) * dk * 2
    for bb in (128, 64, 32, 16, 8, 4):
        if bb * per_row * 2 <= budget:
            return min(bb, max(batch, 1))
    hard = 80 * 1024 * 1024  # under the 100MB vmem_limit with headroom
    bb = 4 if 4 * per_row * 2 <= hard else 2
    return min(bb, max(batch, 1))


def t5_attention(
    q: jax.Array,  # [B, H, Lq, dk]
    k: jax.Array,  # [B, H, Lk, dk]
    v: jax.Array,  # [B, H, Lk, dk]
    bias: jax.Array,  # [H, Lq, Lk] f32
    mask: jax.Array,  # [B, Lk] int32/bool, 1 = attend
    seed: jax.Array,  # [1] int32
    *,
    causal: bool = False,
    dropout_rate: float = 0.0,
    block_b: int | None = None,
    block_b_fwd: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused T5 attention (no 1/sqrt(d) scale). Differentiable in q/k/v/bias.

    An explicit block_b sizes BOTH kernels (block_b_fwd overrides the
    forward's); when unset, each pass gets a VMEM-budget auto-pick — the
    forward's working set is ~2/3 the backward's, so it runs larger
    blocks."""
    assert q.ndim == 4 and k.shape == v.shape and q.shape[:2] == k.shape[:2], (q.shape, k.shape)
    assert bias.shape == (q.shape[1], q.shape[2], k.shape[2]), bias.shape
    if causal:
        assert q.shape[2] == k.shape[2], "causal attention assumes Lq == Lk"
    batch, _, lq, dk = q.shape
    lk = k.shape[2]
    if block_b_fwd is None:
        block_b_fwd = (
            block_b
            if block_b is not None
            else _auto_block_b(batch, lq, lk, dk, n_score_bufs=2, budget=24 * 1024 * 1024)
        )
    if block_b is None:
        block_b = _auto_block_b(batch, lq, lk, dk)
    mask = mask.astype(jnp.int32)[:, None, :]  # [B, 1, Lk]; see _specs
    seed = seed.reshape(1).astype(jnp.int32)
    return _fused_attention(
        causal, float(dropout_rate), block_b_fwd, block_b, interpret,
        q, k, v, bias.astype(jnp.float32), mask, seed,
    )


def dropout_keep_oracle(seed, batch, heads, lq, lk, dropout_rate):
    """Pure-JAX replica of the kernel's counter-based keep mask
    ([B, H, Lq, Lk] bool) — for oracle tests and debugging. Differs from
    the kernel only in counter layout (4-D iota vs per-block 3-D + offset);
    the hash itself is the shared hash_keep_bits."""
    from rqvae_tpu.ops.hash_dropout import hash_keep_bits

    shape = (batch, heads, lq, lk)
    bi = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    hi = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    qi = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    kj = jax.lax.broadcasted_iota(jnp.uint32, shape, 3)
    x = ((bi * jnp.uint32(heads) + hi) * jnp.uint32(lq) + qi) * jnp.uint32(lk) + kj
    return hash_keep_bits(x, jnp.asarray(seed).reshape(()), dropout_rate)


def attention_reference(q, k, v, bias, mask, *, causal=False, dropout_keep=None, dropout_rate=0.0):
    """Pure-JAX oracle with identical semantics (dropout_keep: explicit
    [B, H, Lq, Lk] keep-mask for testing against realized kernel bits)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s + bias[None].astype(jnp.float32)
    s = s + jnp.where(mask[:, None, None, :] != 0, 0.0, NEG_INF)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        cm = jnp.tril(jnp.ones((lq, lk), bool))
        s = s + jnp.where(cm[None, None], 0.0, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_keep is not None:
        p = jnp.where(dropout_keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return o.astype(q.dtype)
