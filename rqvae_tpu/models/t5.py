"""Native T5-style transformer stacks (encoder + decoder) in flax.linen.

The reference builds its retrieval model from HuggingFace `T5EncoderModel` /
`T5Stack` (reference modules/model.py:77-96). We re-implement the same
architecture natively so the whole forward is one XLA program:

- RMSNorm (T5LayerNorm): no mean subtraction, no bias, eps 1e-6.
- Pre-norm residual blocks with dropout (default 0.1, the HF T5Config
  default the reference inherits).
- Attention WITHOUT 1/sqrt(d) scaling (T5 bakes the scale into init),
  bias-free q/k/v/o projections, d_kv fixed (default 64) independent of
  d_model — matching T5Config defaults.
- Shared relative position bias: computed by the first block of each stack
  and reused by all blocks (bidirectional buckets in the encoder, causal in
  the decoder); 32 buckets, max distance 128. Cross-attention has no bias.
- FFN: wi -> relu -> dropout -> wo (feed_forward_proj="relu" default).
- Final RMSNorm + dropout at the end of each stack.

TPU-first: no KV cache machinery — the decoder sequences in this domain are
at most L+1 ~= 4 tokens (one semantic-ID tuple), so beam search recomputes
the tiny decoder per level instead of reordering a cache (reference
model.py:374-380); everything stays static-shape inside one jit.

Initialization mirrors HF T5's scheme (factor=1.0): q ~ N(0, (d_model *
d_kv)^-0.5), k/v ~ N(0, d_model^-0.5), o ~ N(0, (n_heads*d_kv)^-0.5),
wi ~ N(0, d_model^-0.5), wo ~ N(0, d_ff^-0.5), rel-bias ~ N(0,
d_model^-0.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rqvae_tpu.ops.embedding import embedding_lookup

NEG_INF = -1e9

# fused encoder-stack length gate: below this the XLA forward wins (same
# crossover as the fused-attention inference gate — short rows don't pay
# the HBM round-trips the kernel exists to remove); module-level so tests
# can monkeypatch it down to interpret-friendly sizes
FUSED_ENCODE_MIN_LEN = 512

# fused decoder-stack length gate, on the ENCODER row length Le: the kernel
# exists to collapse the ~50 tiny XLA dispatches of one short-row decode
# level, but it streams the whole [NL, B, H, Le, dk] cross-KV cache through
# VMEM per batch block, so its economics invert as Le grows. Chip-measured
# (benchmarks/r4_tpu_session*.py): Le=81 (Amazon) 3.05 -> 2.50 ms/batch
# (+22% QPS); Le=800 (ML-32M) +2.5 ms (loses); Le=256 fails to even fit the
# 100MB scoped-vmem limit under the current block schedule. Applies to the
# "on" mode too ("on" only forces past the device-count gate, like the
# other kernels' size gates).
FUSED_DECODE_MAX_LEN = 128


@dataclass(frozen=True)
class T5StackConfig:
    d_model: int = 128
    d_kv: int = 64
    num_heads: int = 6
    d_ff: int = 1024
    num_layers: int = 4
    dropout: float = 0.1
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    # compute dtype ("float32" | "bfloat16"): params stay f32; matmuls run
    # in bf16 on the MXU at 2x rate. Softmax/normalization stay f32.
    dtype: str = "float32"
    # rematerialize each block in the backward pass (jax.checkpoint):
    # trades recompute FLOPs for activation memory at large batch/seq.
    remat: bool = False
    # fused Pallas attention kernel (ops/pallas/attention.py):
    #   "auto"      — on for single-device TPU when the query length is big
    #                 enough to matter (the encoder; the <=4-token decoder
    #                 stays on XLA). Multi-device jit falls back to XLA —
    #                 a pallas_call inside a GSPMD program replicates.
    #   "on"        — force the kernel past the device-count gate (caller
    #                 guarantees per-shard execution, e.g. a shard_map
    #                 step); training/size gates still apply.
    #   "off"       — always the XLA path.
    #   "interpret" — force the kernel in interpreter mode (CPU tests).
    fused_attention: str = "auto"
    # counter-based dropout (ops/hash_dropout.py): the keep-mask is a hash
    # of the element position fused into the elementwise chain and
    # regenerated in the backward pass — no mask bits ever reach HBM
    # (flax Dropout's saved masks cost ~13 ms/step at the flagship
    # stage-2 geometry). False falls back to nn.Dropout.
    hash_dropout: bool = True
    # fused decoder-stack serving kernel (ops/pallas/decoder_stack.py):
    # runs ALL decoder layers of one beam-search decode level in a single
    # pallas_call with weights resident in VMEM — the XLA path's ~50 tiny
    # dispatches per level are the measured serving cost at short rows
    # (benchmarks/beam_phases.py). Same mode strings as fused_attention:
    # "auto" (single-device TPU inference), "on", "off", "interpret".
    # Gated to encoder rows <= FUSED_DECODE_MAX_LEN in all modes but
    # off/interpret (chip-measured crossover, RESULTS.md round 4).
    fused_decode: str = "auto"
    # fused encoder-stack serving kernel (ops/pallas/encoder_stack.py):
    # whole encoder forward in one pallas_call for LONG rows (the XLA path
    # streams ~0.9 GB/layer of [B*L, d]/[B*L, dff] intermediates through
    # HBM at the ML-32M geometry — 10.9 ms vs a ~4 ms roofline, 61-73% of
    # that serving batch per benchmarks/beam_phases.py). Gated to
    # inference at L >= FUSED_ENCODE_MIN_LEN; same mode strings.
    fused_encode: str = "auto"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def _normal(stddev):
    return nn.initializers.normal(stddev=stddev)


def _dropout(module: nn.Module, x: jax.Array, training: bool) -> jax.Array:
    """Dropout at rate module.cfg.dropout: counter-based hash dropout by
    default (zero HBM mask traffic, seed-only residual), nn.Dropout when
    cfg.hash_dropout=False."""
    cfg = module.cfg
    if cfg.dropout == 0.0 or not training:
        return x
    if cfg.hash_dropout:
        from rqvae_tpu.ops.hash_dropout import dropout_seed, hash_dropout

        return hash_dropout(x, dropout_seed(module.make_rng("dropout")), float(cfg.dropout))
    # functional flax-style dropout (nn.Dropout's math, but no submodule —
    # the stacks define modules in setup(), so inline nn.Dropout children
    # are illegal here; make_rng still yields a fresh per-call stream)
    keep_prob = 1.0 - cfg.dropout
    mask = jax.random.bernoulli(module.make_rng("dropout"), keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(dtype)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return x * w


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """T5's log-binned relative position bucketing (HF modeling_t5)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5StackConfig
    has_relative_bias: bool = False
    bidirectional: bool = True  # bucket scheme for the relative bias

    def setup(self):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        d = cfg.d_model
        dt = cfg.compute_dtype
        # q/k/v stay THREE separate GEMMs on purpose: fusing them into one
        # [d, 3*inner] wide GEMM wins 1.135x on the projection GEMMs in
        # isolation (benchmarks/gemm_fusion_micro.py, 40.9 -> 46.4% MFU)
        # but LOSES end-to-end — the forward jnp.split and its backward
        # concat materialize ~250MB/step of extra HBM copies at the
        # flagship geometry, regressing the stage-2 step 38.0 -> 40.6 ms
        # (RESULTS.md round 3). XLA does not fuse the slices into the
        # downstream head reshape/transpose.
        self.q = nn.Dense(inner, use_bias=False, dtype=dt, kernel_init=_normal((d * cfg.d_kv) ** -0.5))
        self.k = nn.Dense(inner, use_bias=False, dtype=dt, kernel_init=_normal(d**-0.5))
        self.v = nn.Dense(inner, use_bias=False, dtype=dt, kernel_init=_normal(d**-0.5))
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=dt, kernel_init=_normal(inner**-0.5))
        if self.has_relative_bias:
            self.rel_bias = self.param(
                "rel_bias", _normal(d**-0.5), (cfg.rel_buckets, cfg.num_heads)
            )

    def _heads(self, x: jax.Array) -> jax.Array:
        """[B, L, H*dk] -> [B, H, L, dk]."""
        B, L, _ = x.shape
        return x.reshape(B, L, self.cfg.num_heads, self.cfg.d_kv).transpose(0, 2, 1, 3)

    def kv_heads(self, kv_in: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Projected K/V heads ([B, H, Lk, dk] each) — the level-invariant
        half of cross-attention. Beam search computes these ONCE per
        generate() and feeds them back via `kv_cache` so the L decode
        stages skip the [B*Le, d] @ [d, d] K/V GEMMs. (Within the current
        single-jit generate() XLA CSE already dedupes those GEMMs, so this
        is an explicit guarantee rather than a measured win — RESULTS.md
        round 3.)"""
        return self._heads(self.k(kv_in)), self._heads(self.v(kv_in))

    def _use_fused(self, lq: int, lk: int, training: bool) -> bool:
        mode = self.cfg.fused_attention
        if mode == "interpret":
            return True
        if mode == "off":
            return False
        # size gate: the <=4-token decoder self/cross attention is cheaper
        # unfused than padded to kernel tiles
        if lq < 16 or lk < 16:
            return False
        # Inference: at SHORT rows the kernel's forward loses to XLA
        # (B=64 L=84 fwd: 1.06 -> 1.62 ms, benchmarks/enc_micro.py), but at
        # long rows the whole-row-in-VMEM design wins big (L=804 fwd:
        # 4.61 -> 1.32 ms, benchmarks/attn_micro_long.py) because XLA
        # materializes the [B,H,L,L] f32 scores in HBM. Serve fused only
        # where measured to win; training always benefits (the backward is
        # the kernel's main win: 53.6 -> 38.1 ms at the flagship step).
        if not training and min(lq, lk) < 512:
            return False
        if mode == "on":
            # forced: caller guarantees per-shard execution (e.g. inside a
            # shard_map train step) on a TPU backend
            return True
        # "auto": single-device TPU. Under a multi-device GSPMD jit a
        # pallas_call would be replicated (all-gather) — use the shard_map
        # step (train/decoder_steps.py) for multi-chip kernels instead.
        return jax.default_backend() == "tpu" and jax.device_count() == 1

    def __call__(
        self,
        x: jax.Array,  # [B, Lq, d]
        kv: Optional[jax.Array] = None,  # [B, Lk, d] for cross-attention
        mask: Optional[jax.Array] = None,  # [B, Lk] 1=attend
        position_bias: Optional[jax.Array] = None,  # [1, H, Lq, Lk]
        causal: bool = False,
        training: bool = False,
        kv_cache: Optional[tuple] = None,  # precomputed kv_heads() output
    ):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        d = cfg.d_model
        B, Lq, _ = x.shape

        dt = cfg.compute_dtype
        q = self._heads(self.q(x))
        if kv_cache is not None:
            k, v = kv_cache  # [B, H, Lk, dk] from kv_heads()
        else:
            k, v = self.kv_heads(x if kv is None else kv)
        Lk = k.shape[2]

        if position_bias is None and self.has_relative_bias:
            ctx = jnp.arange(Lq)[:, None]
            mem = jnp.arange(Lk)[None, :]
            buckets = relative_position_bucket(
                mem - ctx, self.bidirectional, cfg.rel_buckets, cfg.rel_max_distance
            )
            # matmul-backward lookup (ops/embedding.py): the plain-index
            # gradient is a scatter-add over Lq*Lk indices into the tiny
            # [rel_buckets, H] table — at the 800-token geometry that one
            # scatter (646k keys) dominated the backward (step_phases r3:
            # non-attention bwd was 4x its fwd before this)
            position_bias = embedding_lookup(self.rel_bias, buckets).transpose(2, 0, 1)[None]  # [1,H,Lq,Lk]

        if self._use_fused(Lq, Lk, training):
            from rqvae_tpu.ops.pallas.attention import t5_attention

            rate = float(cfg.dropout) if training else 0.0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            bias_in = (
                position_bias[0]
                if position_bias is not None
                else jnp.zeros((cfg.num_heads, Lq, Lk), jnp.float32)
            )
            mask_in = mask if mask is not None else jnp.ones((B, Lk), jnp.int32)
            out = t5_attention(
                q, k, v, bias_in, mask_in, seed,
                causal=causal,
                dropout_rate=rate,
                interpret=cfg.fused_attention == "interpret",
            ).astype(dt)
        else:
            # T5: no 1/sqrt(d) scaling; scores accumulate in f32
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            if position_bias is not None:
                scores = scores + position_bias

            if mask is not None:
                scores = scores + jnp.where(mask[:, None, None, :], 0.0, NEG_INF)
            if causal:
                cmask = jnp.tril(jnp.ones((Lq, Lk), bool))
                scores = scores + jnp.where(cmask[None, None], 0.0, NEG_INF)

            weights = jax.nn.softmax(scores, axis=-1).astype(dt)
            weights = _dropout(self, weights, training)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(dt)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        return self.o(out), position_bias


class T5FFN(nn.Module):
    cfg: T5StackConfig

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt, kernel_init=_normal(cfg.d_model**-0.5), name="wi")(x)
        h = nn.relu(h)
        h = _dropout(self, h, training)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt, kernel_init=_normal(cfg.d_ff**-0.5), name="wo")(h)


class T5Block(nn.Module):
    cfg: T5StackConfig
    is_decoder: bool = False
    has_relative_bias: bool = False

    def setup(self):
        cfg = self.cfg
        self.ln_self = RMSNorm(cfg.layer_norm_eps)
        self.self_attn = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias, bidirectional=not self.is_decoder
        )
        if self.is_decoder:
            self.ln_cross = RMSNorm(cfg.layer_norm_eps)
            self.cross_attn = T5Attention(cfg, has_relative_bias=False)
        self.ln_ffn = RMSNorm(cfg.layer_norm_eps)
        self.ffn = T5FFN(cfg)

    def cross_kv(self, enc_out: jax.Array):
        """This block's cross-attention K/V heads over `enc_out` (the
        level-invariant beam-search cache; see T5Attention.kv_heads)."""
        return self.cross_attn.kv_heads(enc_out)

    def __call__(
        self,
        x,
        enc_out=None,
        self_mask=None,
        enc_mask=None,
        position_bias=None,
        training: bool = False,
        beams: int = 1,  # x batch = beams * enc_out batch (beam search)
        cross_kv=None,  # precomputed cross-attention (k, v) heads
    ):
        drop = lambda h: _dropout(self, h, training)

        # self attention (causal in the decoder)
        h, position_bias = self.self_attn(
            self.ln_self(x),
            mask=self_mask,
            position_bias=position_bias,
            causal=self.is_decoder,
            training=training,
        )
        x = x + drop(h)

        if self.is_decoder and (enc_out is not None or cross_kv is not None):
            xq = self.ln_cross(x)
            if beams > 1:
                # beam-folded cross-attention: the k beams of one query
                # share enc_out, so attend as [B, k*T] queries against the
                # UN-replicated [B, Le] keys/values — k/v projections and
                # enc_out stay at batch B instead of B*k. The reshape
                # [B*k, T, d] <-> [B, k*T, d] is layout-free. Cross-attn has
                # no position bias and no self mask, so folding is exact.
                Bk, T, d = xq.shape
                xq = xq.reshape(Bk // beams, beams * T, d)
            h, _ = self.cross_attn(
                xq,
                kv=enc_out,
                mask=enc_mask,
                training=training,
                kv_cache=cross_kv,
            )
            if beams > 1:
                h = h.reshape(x.shape)
            x = x + drop(h)

        h = self.ffn(self.ln_ffn(x), training=training)
        return x + drop(h), position_bias


class T5Stack(nn.Module):
    """Encoder or decoder stack over pre-computed input embeddings."""

    cfg: T5StackConfig
    is_decoder: bool = False

    def setup(self):
        cfg = self.cfg
        # remat: all block args passed positionally; `training`/`beams`
        # (indices 6, 7 counting self) must be static
        block_cls = nn.remat(T5Block, static_argnums=(6, 7)) if cfg.remat else T5Block
        # list attribute `block` -> flax names "block_0", "block_1", ...
        self.block = [
            block_cls(cfg, is_decoder=self.is_decoder, has_relative_bias=(i == 0))
            for i in range(cfg.num_layers)
        ]
        self.ln_final = RMSNorm(cfg.layer_norm_eps)

    def cross_kv(self, enc_out: jax.Array):
        """Per-layer cross-attention K/V heads over `enc_out` — computed
        once per generate() and threaded back through __call__(cross_kv=...)
        so each beam-search decode stage skips the level-invariant
        [B*Le, d] @ [d, d] K/V projections (decoder stacks only)."""
        assert self.is_decoder, "cross_kv is a decoder-stack cache"
        return tuple(b.cross_kv(enc_out.astype(self.cfg.compute_dtype)) for b in self.block)

    def use_fused_decode(self, enc_len: int):
        """Serving-kernel gate (cfg.fused_decode): False, True, or
        "interpret". `enc_len` is the encoder row length Le the decode
        levels cross-attend (the kernel's cost driver — see
        FUSED_DECODE_MAX_LEN). "auto" = single-device TPU only — a
        pallas_call inside a GSPMD program would replicate instead of
        shard; "on" forces past that device-count gate (per-shard
        execution, e.g. shard_map serving) but keeps the measured length
        gate."""
        mode = self.cfg.fused_decode
        if mode == "off":
            return False
        if mode == "interpret":
            return "interpret"
        # measured size gate, applies to "on" too: wins at short rows
        # (Amazon Le=81: +22% QPS), loses/OOMs at long rows — chip A/Bs in
        # benchmarks/r4_tpu_session*.py, RESULTS.md round 4
        if enc_len > FUSED_DECODE_MAX_LEN:
            return False
        if mode == "on":
            return True
        # "auto": chip-proven round 4 (compiled equivalence + A/B wins)
        return jax.default_backend() == "tpu" and jax.device_count() == 1

    def fused_decode(
        self,
        x_folded: jax.Array,  # [B, beams*T, d] decoder input embeddings
        cross_kv: tuple,  # self.cross_kv(enc_out) output
        enc_mask: jax.Array,  # [B, Le]
        beams: int,
        interpret: bool = False,
    ) -> jax.Array:
        """One-dispatch decoder-stack forward for beam-search serving
        (ops/pallas/decoder_stack.py): all layers fused, weights resident
        in VMEM, cross-attention against the precomputed K/V cache,
        self-attention beam-folded under a static block-diagonal causal
        (+shared rel-pos) bias. Inference only (no dropout path). Returns
        [B, beams*T, d] f32 ln_final-normalized states — the caller slices
        each beam's last position."""
        from rqvae_tpu.ops.pallas.decoder_stack import t5_decoder_stack_infer

        assert self.is_decoder
        cfg = self.cfg
        NL, H, dk, d = cfg.num_layers, cfg.num_heads, cfg.d_kv, cfg.d_model
        cdt = cfg.compute_dtype
        B, kt, _ = x_folded.shape
        T = kt // beams
        assert kt == beams * T
        p = self.variables["params"]

        def stack_w(get):
            return jnp.stack([get(p[f"block_{i}"]) for i in range(NL)])

        # pre-shape projections per head so the kernel never slices the
        # lane dimension at a sub-tile (dk=64) offset
        ph_in = lambda k_: k_.reshape(d, H, dk).transpose(1, 0, 2)  # [H, d, dk]
        ph_out = lambda k_: k_.reshape(H, dk, d)  # [H, dk, d]
        wq = stack_w(lambda b: ph_in(b["self_attn"]["q"]["kernel"])).astype(cdt)
        wk = stack_w(lambda b: ph_in(b["self_attn"]["k"]["kernel"])).astype(cdt)
        wv = stack_w(lambda b: ph_in(b["self_attn"]["v"]["kernel"])).astype(cdt)
        wo = stack_w(lambda b: ph_out(b["self_attn"]["o"]["kernel"])).astype(cdt)
        cq = stack_w(lambda b: ph_in(b["cross_attn"]["q"]["kernel"])).astype(cdt)
        co = stack_w(lambda b: ph_out(b["cross_attn"]["o"]["kernel"])).astype(cdt)
        wi = stack_w(lambda b: b["ffn"]["wi"]["kernel"]).astype(cdt)
        wo2 = stack_w(lambda b: b["ffn"]["wo"]["kernel"]).astype(cdt)
        ln_s = stack_w(lambda b: b["ln_self"]["weight"]).astype(jnp.float32)
        ln_c = stack_w(lambda b: b["ln_cross"]["weight"]).astype(jnp.float32)
        ln_f = stack_w(lambda b: b["ln_ffn"]["weight"]).astype(jnp.float32)
        ln_final = p["ln_final"]["weight"].astype(jnp.float32)[None, :]

        # block-diagonal folded self-attention bias: rel-pos (block 0's
        # table, shared by all layers) + causal, tiled per beam; cross-beam
        # pairs get -1e9 (underflows to exactly 0 through softmax, so the
        # fold is bit-exact vs per-beam attention)
        rel = p["block_0"]["self_attn"]["rel_bias"].astype(jnp.float32)  # [nb, H]
        ctx = jnp.arange(T)[:, None]
        mem = jnp.arange(T)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, False, cfg.rel_buckets, cfg.rel_max_distance
        )
        bias_tt = rel[buckets].transpose(2, 0, 1)  # [H, T, T]
        bias_tt = bias_tt + jnp.where(mem <= ctx, 0.0, NEG_INF)[None]
        beam_of = jnp.arange(kt) // T
        same_beam = beam_of[:, None] == beam_of[None, :]
        bias_fold = jnp.where(same_beam[None], jnp.tile(bias_tt, (1, beams, beams)), NEG_INF)

        kc = jnp.stack([kv[0] for kv in cross_kv]).astype(cdt)  # [NL, B, H, Le, dk]
        vc = jnp.stack([kv[1] for kv in cross_kv]).astype(cdt)

        # pad the folded kT dim to a multiple of 8: Mosaic's lowering of the
        # kernel's [M, dk] <-> [bb, kT, dk] regroupings requires vreg-aligned
        # sublane groups (kT=1, the level-0 shape, fails to compile on real
        # TPU — benchmarks/mosaic_repro.py bisected it; interpret mode is
        # blind to this). Dummy query rows carry an all(-1e9) bias row so
        # they attend uniformly into garbage that is sliced off below; real
        # rows never attend dummy columns (-1e9 -> exact 0 through softmax).
        kt8 = -(-kt // 8) * 8
        if kt8 != kt:
            x_folded = jnp.pad(x_folded, ((0, 0), (0, kt8 - kt), (0, 0)))
            bias_fold = jnp.pad(
                bias_fold, ((0, 0), (0, kt8 - kt), (0, kt8 - kt)),
                constant_values=NEG_INF,
            )
        # cross-attention mask pre-broadcast to the full [B, kT, Le] block:
        # an in-kernel [bb, 1, Le] -> [bb, kT, Le] broadcast lowers through
        # vector extracts that CHECK-fail under the batch grid (bisected in
        # benchmarks/mosaic_repro.py); full-shape blocks sidestep it and the
        # extra HBM traffic is noise next to the K/V cache stream
        mask_term = jnp.broadcast_to(
            jnp.where(enc_mask[:, None, :] != 0, 0.0, NEG_INF).astype(jnp.float32),
            (B, kt8, enc_mask.shape[-1]),
        )
        y = t5_decoder_stack_infer(
            x_folded.astype(cdt), wq, wk, wv, wo, cq, co, wi, wo2,
            ln_s, ln_c, ln_f, ln_final, bias_fold, kc, vc, mask_term,
            eps=cfg.layer_norm_eps, interpret=interpret,
        )
        return y[:, :kt]

    def use_fused_encode(self, L: int, training: bool):
        """Encoder-serving-kernel gate (cfg.fused_encode): False, True, or
        "interpret". Inference-only, long rows only (short rows lose to
        XLA — see FUSED_ENCODE_MIN_LEN)."""
        if self.is_decoder or training:
            return False
        # during init the param tree fused_encode reads doesn't exist yet
        # (scope check keeps this callable on unbound modules, e.g. tests)
        if self.scope is not None and self.is_initializing():
            return False
        mode = self.cfg.fused_encode
        if mode == "off":
            return False
        if L < FUSED_ENCODE_MIN_LEN:
            return False
        if mode == "interpret":
            return "interpret"
        if mode == "on":
            return True
        # "auto": chip-proven round 4 — compiled equivalence (top-1 match
        # 1.0) and an A/B win at its gated regime (ML-32M Le=800:
        # 15.55 -> 15.11 ms/batch; the baseline encoder already serves the
        # fused ATTENTION kernel at long rows, so the stack kernel's extra
        # win is the remaining inter-op HBM traffic) —
        # benchmarks/r4_tpu_session.py, RESULTS.md round 4
        return jax.default_backend() == "tpu" and jax.device_count() == 1

    def fused_encode(
        self,
        x: jax.Array,  # [B, L, d] encoder input embeddings
        self_mask: Optional[jax.Array],  # [B, L] 1 = valid key
        interpret: bool = False,
    ) -> jax.Array:
        """One-dispatch encoder-stack forward for long-row serving
        (ops/pallas/encoder_stack.py): all layers fused, weights + shared
        rel-pos bias resident in VMEM. Rows pad to a multiple of 8
        sublanes (padded keys carry -1e9 -> exact-zero softmax weight, so
        every real row — valid or not, matching the XLA path's key-only
        masking — is bit-identical; padded rows are sliced off).
        Inference only (no dropout path). Returns [B, L, d] f32."""
        from rqvae_tpu.ops.pallas.encoder_stack import t5_encoder_stack_infer

        assert not self.is_decoder
        cfg = self.cfg
        NL, H, dk, d = cfg.num_layers, cfg.num_heads, cfg.d_kv, cfg.d_model
        cdt = cfg.compute_dtype
        B, L, _ = x.shape
        p = self.variables["params"]

        def stack_w(get):
            return jnp.stack([get(p[f"block_{i}"]) for i in range(NL)])

        ph_in = lambda k_: k_.reshape(d, H, dk).transpose(1, 0, 2)  # [H, d, dk]
        ph_out = lambda k_: k_.reshape(H, dk, d)  # [H, dk, d]
        wq = stack_w(lambda b: ph_in(b["self_attn"]["q"]["kernel"])).astype(cdt)
        wk = stack_w(lambda b: ph_in(b["self_attn"]["k"]["kernel"])).astype(cdt)
        wv = stack_w(lambda b: ph_in(b["self_attn"]["v"]["kernel"])).astype(cdt)
        wo = stack_w(lambda b: ph_out(b["self_attn"]["o"]["kernel"])).astype(cdt)
        wi = stack_w(lambda b: b["ffn"]["wi"]["kernel"]).astype(cdt)
        wo2 = stack_w(lambda b: b["ffn"]["wo"]["kernel"]).astype(cdt)
        ln_s = stack_w(lambda b: b["ln_self"]["weight"]).astype(jnp.float32)
        ln_f = stack_w(lambda b: b["ln_ffn"]["weight"]).astype(jnp.float32)
        ln_final = p["ln_final"]["weight"].astype(jnp.float32)[None, :]

        L8 = -(-L // 8) * 8
        if L8 != L:
            x = jnp.pad(x, ((0, 0), (0, L8 - L), (0, 0)))

        # shared bidirectional rel-pos bias at the padded length (block 0's
        # table; relative buckets make the real (q, k) entries identical to
        # the unpadded program)
        rel = p["block_0"]["self_attn"]["rel_bias"].astype(jnp.float32)  # [nb, H]
        ctx = jnp.arange(L8)[:, None]
        mem = jnp.arange(L8)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, True, cfg.rel_buckets, cfg.rel_max_distance
        )
        bias = rel[buckets].transpose(2, 0, 1)  # [H, L8, L8]

        if self_mask is None:
            valid = jnp.ones((B, L), bool)
        else:
            valid = self_mask.astype(bool)
        valid = jnp.pad(valid, ((0, 0), (0, L8 - L)))  # padded keys invalid
        mask = jnp.where(valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)

        y = t5_encoder_stack_infer(
            x.astype(cdt), wq, wk, wv, wo, wi, wo2, ln_s, ln_f, ln_final,
            bias, mask, eps=cfg.layer_norm_eps, interpret=interpret,
        )
        return y[:, :L]

    def __call__(
        self,
        inputs_embeds: jax.Array,  # [B, L, d]
        self_mask: Optional[jax.Array] = None,  # [B, L] 1=valid
        enc_out: Optional[jax.Array] = None,
        enc_mask: Optional[jax.Array] = None,
        training: bool = False,
        beams: int = 1,  # see T5Block: input batch = beams * enc batch
        cross_kv: Optional[tuple] = None,  # per-layer cross_kv() output
    ) -> jax.Array:
        cfg = self.cfg
        fe = False if self.is_decoder else self.use_fused_encode(
            inputs_embeds.shape[1], training
        )
        if fe:
            return self.fused_encode(
                inputs_embeds, self_mask, interpret=(fe == "interpret")
            )
        x = _dropout(self, inputs_embeds.astype(cfg.compute_dtype), training)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = self.block[i](
                x, enc_out, self_mask, enc_mask, position_bias, training, beams,
                None if cross_kv is None else cross_kv[i],
            )
        x = self.ln_final(x)
        return _dropout(self, x, training).astype(jnp.float32)
