"""Retrieval model: T5-style encoder-decoder over semantic-ID sequences,
with constrained beam-search generation.

Reference parity: /root/reference/modules/model.py
- shared SID embedding table with per-hierarchy offsets  (model.py:105-109,
  129-148: token t of hierarchy h -> row h*K + t; padded positions are
  zeroed by the mask so they hit row 0 but are attention-masked out)
- learned BOS embedding and optional SEP token injected after each item's
  L-token group                                           (model.py:97,150-167)
- optional hashed user-ID embedding prepended             (model.py:111-112,201-212)
- per-hierarchy linear heads                              (model.py:98-103)
- training loss = sum over hierarchies of cross-entropy on teacher-forced
  decoder states                                          (model.py:270-298)
- generation: per level, score candidates by cumulative log-prob, mask
  candidates whose prefix is absent from the corpus, keep top-k beams
                                                          (model.py:300-391)

TPU-first design decisions:
- SEP injection is a static reshape/concat (no dynamic shapes).
- Beam search is ONE jit with the L-level loop unrolled (L is static and
  tiny); the decoder prefix is recomputed per level (<= L+1 tokens) instead
  of reordering a KV cache (reference model.py:374-380).
- Prefix validity is a binary search over sorted packed prefix keys
  (serving/beam.py) instead of the O(N_corpus * B * k * n) equality
  broadcast (model.py:169-182).
- Two candidate modes: exhaustive top-k over all K codewords per level
  (deterministic, default) and the reference's multinomial-without-
  replacement sampling of n_candidates (model.py:314,345), implemented as
  Gumbel top-k with an explicit rng key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.t5 import T5Stack, T5StackConfig
from rqvae_tpu.serving.beam import PrefixTable, extend_keys, valid_children
from rqvae_tpu.models.mlp import stacked_torch_linear_init
from rqvae_tpu.ops.embedding import embedding_lookup
from rqvae_tpu.ops.gumbel import sample_without_replacement

NEG_INF = -1e9


@dataclass(frozen=True)
class RetrievalConfig:
    num_hierarchies: int = 3
    codebook_size: int = 256  # num_embeddings_per_hierarchy
    t5_d_model: int = 128
    t5_d_kv: int = 64
    t5_num_heads: int = 6
    t5_d_ff: int = 1024
    t5_num_layers: int = 4
    t5_dropout: float = 0.1
    top_k_for_generation: int = 10
    n_candidates: int = 64  # sampled-candidate count (reference min(64, K))
    should_add_sep_token: bool = True
    num_user_bins: Optional[int] = None
    sample_candidates: bool = False  # False = exhaustive top-k (deterministic)
    t5_dtype: str = "float32"  # "bfloat16" -> 2x MXU compute, f32 params
    t5_remat: bool = False  # jax.checkpoint each block (memory at scale)
    # fused Pallas attention (ops/pallas/attention.py): "auto" | "on" |
    # "off" | "interpret" — see T5StackConfig.fused_attention ("on" forces
    # the kernel where "auto" would decline, e.g. per-shard inside a
    # shard_map step on a multi-device TPU backend)
    t5_fused_attention: str = "auto"
    # counter-based dropout (ops/hash_dropout.py); False = flax nn.Dropout
    t5_hash_dropout: bool = True
    # fused decoder-stack serving kernel (ops/pallas/decoder_stack.py):
    # one pallas_call per beam-search decode level instead of ~50 XLA
    # dispatches — see T5StackConfig.fused_decode
    t5_fused_decode: str = "auto"
    # fused encoder-stack serving kernel for long rows
    # (ops/pallas/encoder_stack.py) — see T5StackConfig.fused_encode
    t5_fused_encode: str = "auto"

    @property
    def t5(self) -> T5StackConfig:
        return T5StackConfig(
            d_model=self.t5_d_model,
            d_kv=self.t5_d_kv,
            num_heads=self.t5_num_heads,
            d_ff=self.t5_d_ff,
            num_layers=self.t5_num_layers,
            dropout=self.t5_dropout,
            dtype=self.t5_dtype,
            remat=self.t5_remat,
            fused_attention=self.t5_fused_attention,
            hash_dropout=self.t5_hash_dropout,
            fused_decode=self.t5_fused_decode,
            fused_encode=self.t5_fused_encode,
        )


class ModelOutput(NamedTuple):
    loss: jax.Array  # scalar
    logits: jax.Array  # [B, L, K] per-hierarchy teacher-forced logits
    loss_d: jax.Array  # [L] per-hierarchy losses


class GenerationOutput(NamedTuple):
    sem_ids: jax.Array  # [B, top_k, L]
    log_probas: jax.Array  # [B, top_k]


def strip_dedup_col(flat: jax.Array, sem_ids_dim: int, n_layers: int) -> jax.Array:
    """[B, N*sem_ids_dim] -> [B, N*n_layers] (reference model.py:26-45)."""
    B, total = flat.shape
    N = total // sem_ids_dim
    return flat.reshape(B, N, sem_ids_dim)[:, :, :n_layers].reshape(B, N * n_layers)


class EncoderDecoderRetrievalModel(nn.Module):
    config: RetrievalConfig

    def setup(self):
        cfg = self.config
        L, K, d = cfg.num_hierarchies, cfg.codebook_size, cfg.t5_d_model
        # HF T5 init: embeddings ~ N(0, 1) (factor=1.0)
        self.sid_embedding = self.param("sid_embedding", nn.initializers.normal(1.0), (L * K, d))
        self.bos_token = self.param("bos_token", nn.initializers.normal(1.0), (1, d))
        if cfg.should_add_sep_token:
            self.sep_token = self.param("sep_token", nn.initializers.normal(1.0), (1, d))
        if cfg.num_user_bins:
            self.user_embedding = self.param(
                "user_embedding", nn.initializers.normal(1.0), (cfg.num_user_bins, d)
            )
        self.encoder = T5Stack(cfg.t5, is_decoder=False, name="encoder")
        self.decoder = T5Stack(cfg.t5, is_decoder=True, name="decoder")
        # per-hierarchy output heads [L, d, K] (reference: L x Linear(d, K));
        # stacked init draws each level at torch Linear's U(-1/sqrt(d), .)
        # (plain variance_scaling would fold L into fan_in: sqrt(L) small)
        self.heads = self.param("heads", stacked_torch_linear_init, (L, d, K))

    # ---------- shared helpers ----------

    def _offsets(self, n_cols: int) -> jax.Array:
        """Per-hierarchy embedding offsets repeated across columns
        (reference model.py:129-148)."""
        cfg = self.config
        offs = jnp.arange(cfg.num_hierarchies, dtype=jnp.int32) * cfg.codebook_size
        reps = -(-n_cols // cfg.num_hierarchies)
        return jnp.tile(offs, reps)[:n_cols]

    def encoder_forward(
        self,
        sem_ids: jax.Array,  # [B, N*L], dedup stripped, -1 padded
        seq_mask: jax.Array,  # [B, N*L] 1=valid
        user_ids: Optional[jax.Array] = None,  # [B]
        training: bool = False,
    ):
        cfg = self.config
        B, T = sem_ids.shape
        mask = seq_mask.astype(jnp.int32)
        shifted = (sem_ids + self._offsets(T)[None, :]) * mask  # padding -> row 0, masked out
        # matmul-backward lookup: the default scatter-add gradient dominates
        # the train step on TPU (see ops/embedding.py)
        embs = embedding_lookup(self.sid_embedding, shifted)  # [B, T, d]

        if cfg.should_add_sep_token:
            L = cfg.num_hierarchies
            items = T // L
            e = embs.reshape(B, items, L, -1)
            m = mask.reshape(B, items, L)
            sep = jnp.broadcast_to(self.sep_token, (B, items, 1, e.shape[-1]))
            e = jnp.concatenate([e, sep], axis=2)
            m = jnp.concatenate([m, m[:, :, -1:]], axis=2)
            embs = e.reshape(B, items * (L + 1), -1)
            mask = m.reshape(B, items * (L + 1))

        if user_ids is not None and cfg.num_user_bins:
            u = jnp.remainder(user_ids, cfg.num_user_bins)
            ue = self.user_embedding[u][:, None, :]
            embs = jnp.concatenate([ue, embs], axis=1)
            mask = jnp.concatenate([jnp.ones((B, 1), mask.dtype), mask], axis=1)

        enc = self.encoder(embs, self_mask=mask, training=training)
        return enc, mask

    def _decoder_embs(self, fut_ids: Optional[jax.Array], rows: int) -> jax.Array:
        """BOS + offset-shifted prefix embeddings: [rows, T+1, d]."""
        bos = jnp.broadcast_to(self.bos_token, (rows, 1, self.config.t5_d_model))
        if fut_ids is None or fut_ids.shape[1] == 0:
            return bos
        shifted = fut_ids + self._offsets(fut_ids.shape[1])[None, :]
        return jnp.concatenate([bos, embedding_lookup(self.sid_embedding, shifted)], axis=1)

    def decoder_forward(
        self,
        fut_ids: Optional[jax.Array],  # [B*beams, T] prefix (None = BOS only)
        enc_out: jax.Array,  # [B, Le, d]
        enc_mask: jax.Array,
        training: bool = False,
        beams: int = 1,  # beam search: decoder rows per encoder row
        cross_kv: Optional[tuple] = None,  # decoder.cross_kv(enc_out) cache
    ) -> jax.Array:
        embs = self._decoder_embs(fut_ids, enc_out.shape[0] * beams)
        return self.decoder(
            embs, self_mask=None, enc_out=enc_out, enc_mask=enc_mask, training=training,
            beams=beams, cross_kv=cross_kv,
        )  # [B*beams, T+1, d]

    # ---------- training ----------

    def __call__(self, batch: TokenizedSeqBatch, training: bool = False) -> ModelOutput:
        cfg = self.config
        L = cfg.num_hierarchies
        D = L + 1  # sem_ids_dim including dedup column
        input_ids = strip_dedup_col(batch.sem_ids, D, L)
        mask = strip_dedup_col(batch.seq_mask.astype(jnp.int32), D, L)
        fut = batch.sem_ids_fut[:, :L]

        enc, enc_mask = self.encoder_forward(input_ids, mask, batch.user_ids, training)
        dec = self.decoder_forward(fut, enc, enc_mask, training)[:, :-1]  # [B, L, d]

        logits = jnp.einsum("bld,ldk->blk", dec, self.heads)  # [B, L, K]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, fut[:, :, None], axis=-1)[..., 0]  # [B, L]
        loss_d = jnp.mean(nll, axis=0)  # [L]
        return ModelOutput(loss=jnp.sum(loss_d), logits=logits, loss_d=loss_d)

    # ---------- generation (serving path) ----------

    def generate(
        self,
        sem_ids: jax.Array,  # [B, N*(L+1)] with dedup column (as tokenized)
        seq_mask: jax.Array,
        user_ids: Optional[jax.Array],
        prefix_table: PrefixTable,
        rng: Optional[jax.Array] = None,
    ) -> GenerationOutput:
        """Constrained beam search (reference model.py:300-391)."""
        cfg = self.config
        if cfg.sample_candidates and rng is None:
            raise ValueError(
                "sample_candidates=True requires an rng key for generate() "
                "(the reference draws torch.multinomial noise per call, "
                "model.py:345); pass rng=jax.random.PRNGKey(...)"
            )
        L, K, k = cfg.num_hierarchies, cfg.codebook_size, cfg.top_k_for_generation
        D = L + 1
        input_ids = strip_dedup_col(sem_ids, D, L)
        mask = strip_dedup_col(seq_mask.astype(jnp.int32), D, L)
        B = input_ids.shape[0]

        enc, enc_mask = self.encoder_forward(input_ids, mask, user_ids, training=False)
        # enc_out is NOT replicated across beams: the decoder's beam-folded
        # cross-attention (models/t5.py) attends [B, k*T] queries against
        # the shared [B, Le] keys/values (reference repeat_interleaves the
        # encoder output k-fold instead, model.py:321-322).
        # Cross-attention K/V are level-invariant, so project them ONCE here
        # and reuse across all L decode stages (the reference re-projects
        # enc_out inside every decoder call). Measured-neutral inside this
        # single-jit program — XLA CSE already dedupes the identical K/V
        # GEMMs (RESULTS.md round 3) — but the cache makes the sharing an
        # explicit guarantee and survives any future split of the decode
        # stages into separate programs.
        cross_kv = self.decoder.cross_kv(enc)

        # decode-level dispatch: the fused decoder-stack kernel collapses
        # one level's ~50 tiny XLA ops into a single pallas_call with
        # weights resident in VMEM (ops/pallas/decoder_stack.py — the
        # decode stages are dispatch-bound, ~79% of the Amazon serving
        # batch per benchmarks/beam_phases.py); gate like the attention
        # kernel (t5.py::T5Stack.use_fused_decode; gated on the encoder row
        # length — the kernel streams the cross-KV cache, so it wins only
        # at short rows)
        fd = self.decoder.use_fused_decode(enc.shape[1])

        def decode_last(prefix: Optional[jax.Array], beams: int) -> jax.Array:
            """Last-position decoder states [B*beams, d] for one level."""
            if not fd:
                return self.decoder_forward(
                    prefix, enc, enc_mask, beams=beams, cross_kv=cross_kv
                )[:, -1]
            embs = self._decoder_embs(prefix, B * beams)
            T = embs.shape[1]
            y = self.decoder.fused_decode(
                embs.reshape(B, beams * T, -1), cross_kv, enc_mask,
                beams=beams, interpret=(fd == "interpret"),
            )  # [B, beams*T, d] f32
            return y.reshape(B, beams, T, -1)[:, :, -1].reshape(B * beams, -1)

        def head_logprobs(dec_last: jax.Array, h: int) -> jax.Array:
            logits = dec_last @ self.heads[h]
            return jax.nn.log_softmax(logits, axis=-1)

        def candidate_scores(logp, parent_keys, h, rng_h):
            """Return (scores [.., n_cand], cand_ids [.., n_cand]) with
            invalid prefixes masked to -inf.

            Validity is fetched for ALL K children of each parent at once
            (serving/beam.py::valid_children row gather): the children of
            one packed parent key are one contiguous bitmap row, and a
            B*k-row gather is ~40x faster on TPU than B*k*K scattered
            single-bool gathers (benchmarks/score_phases.py)."""
            child_ok = valid_children(prefix_table, h, parent_keys)[..., :K]
            if cfg.sample_candidates:
                # at least k candidates so the level-0 top-k over [B, n_cands]
                # is well-defined (the reference's working regime is
                # n_cands=64 >= top_k=10, model.py:314)
                n_cands = min(max(cfg.n_candidates, k), K)
                # without replacement (Gumbel top-k), matching the
                # reference's torch.multinomial(probas, n_cands)
                # (model.py:345) — candidates per level are DISTINCT, so
                # no beam slots are wasted on duplicates
                samples = sample_without_replacement(rng_h, logp, n_cands)
                samp_logp = jnp.take_along_axis(logp, samples, axis=-1)
                valid = jnp.take_along_axis(child_ok, samples, axis=-1)
                return jnp.where(valid, samp_logp, NEG_INF), samples
            cand = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), logp.shape)
            return jnp.where(child_ok, logp, NEG_INF), cand

        # --- level 0: all beams share the empty prefix ---
        dec = decode_last(None, 1)  # [B, d]
        logp0 = head_logprobs(dec, 0)  # [B, K]
        # packed-key dtype (NOT bool — dense levels store bitmaps; a dense
        # level-0 implies small keys, so int32 is always safe there)
        t0 = prefix_table.level_keys[0]
        key_dtype = jnp.int32 if t0.dtype == jnp.bool_ else t0.dtype
        zero_keys = jnp.zeros((B,), key_dtype)
        r0 = jax.random.fold_in(rng, 0) if rng is not None else None
        scores0, cand0 = candidate_scores(logp0, zero_keys, 0, r0)  # [B, n]
        top_scores, top_idx = jax.lax.top_k(scores0, k)  # [B, k]
        beam_ids = jnp.take_along_axis(cand0, top_idx, axis=-1)[:, :, None]  # [B, k, 1]
        beam_logp = top_scores
        beam_keys = extend_keys(prefix_table, zero_keys[:, None], beam_ids[..., 0])  # [B, k]

        # --- levels 1..L-1 ---
        for h in range(1, L):
            flat_prefix = beam_ids.reshape(B * k, h)
            dec = decode_last(flat_prefix, k)  # [B*k, d]
            logp = head_logprobs(dec, h).reshape(B, k, K)
            rh = jax.random.fold_in(rng, h) if rng is not None else None
            scores, cand = candidate_scores(logp, beam_keys, h, rh)  # [B, k, n]
            total = beam_logp[:, :, None] + scores
            n = total.shape[-1]
            top_scores, top_idx = jax.lax.top_k(total.reshape(B, k * n), k)
            parent = top_idx // n  # [B, k]
            chosen = jnp.take_along_axis(
                cand.reshape(B, k * n), top_idx, axis=-1
            )  # [B, k]
            parent_ids = jnp.take_along_axis(beam_ids, parent[:, :, None], axis=1)  # [B, k, h]
            beam_ids = jnp.concatenate([parent_ids, chosen[:, :, None]], axis=-1)
            parent_keys = jnp.take_along_axis(beam_keys, parent, axis=1)
            beam_keys = extend_keys(prefix_table, parent_keys, chosen)
            beam_logp = top_scores

        return GenerationOutput(sem_ids=beam_ids, log_probas=beam_logp)
