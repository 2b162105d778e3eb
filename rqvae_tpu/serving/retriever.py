"""End-to-end serving API: user history (item ids) -> top-k retrieved items.

The reference stops at semantic-ID tuples (generate_next_sem_id,
model.py:393-410; its metrics compare tuples). A production retriever also
needs the inverse mapping back to corpus items, which this class provides:
generated L-tuples are mapped to item ids via one searchsorted over the
packed corpus keys (ties — duplicate tuples — resolve to the earliest
corpus item, i.e. dedup column 0).

The whole query path is jit-compiled: cached-table tokenization ->
encoder -> L-level constrained beam search -> inverse lookup.

Live catalog growth: construct with `capacity=<max corpus size>` and call
`extend_corpus(new_features)` to admit new items into serving — every
corpus-sized array is capacity-padded to a STATIC shape and passed to the
query program as an argument, so admission never recompiles anything on
the serving path (tests/test_corpus_extension.py). The reference can only
rebuild its index from scratch (semids.py:76-110).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
from rqvae_tpu.ops.dedup import pack_sem_id_tuples
from rqvae_tpu.serving.beam import build_prefix_table, extend_prefix_table
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer


class RetrievalResult(NamedTuple):
    item_ids: jax.Array  # [B, k] corpus item ids (-1 where no valid beam)
    sem_ids: jax.Array  # [B, k, L]
    log_probas: jax.Array  # [B, k]


def _promote_serving_gates(model: EncoderDecoderRetrievalModel):
    """Promote "auto" Pallas serving-kernel gates to the explicit "on"
    override for per-shard execution. The auto gates decline multi-device
    because a pallas_call inside a plain GSPMD jit would be REPLICATED
    (it has no partitioning rule) — but per-shard execution is exactly
    what shard_map guarantees, so inside one the kernels are safe (same
    promotion as the shard_map train step, train/decoder_steps.py).

    "on" only forces past the device-count gate: every kernel's MEASURED
    size/training gates still apply (fused_attention's lq/lk thresholds,
    fused_encode's FUSED_ENCODE_MIN_LEN, fused_decode's
    FUSED_DECODE_MAX_LEN — models/t5.py), so mesh serving runs exactly the
    chip-proven kernel set single-chip serving runs, per shard."""
    from dataclasses import replace

    if jax.default_backend() != "tpu":
        return model
    upd = {
        f: "on"
        for f in ("t5_fused_attention", "t5_fused_decode", "t5_fused_encode")
        if getattr(model.config, f) == "auto"
    }
    return type(model)(replace(model.config, **upd)) if upd else model


def make_shardmap_generate(
    model: EncoderDecoderRetrievalModel,
    mesh,
    axis: str = "data",
):
    """Batch-sharded constrained beam search via jax.shard_map: each device
    runs the FULL generate() on its batch shard — including the Pallas
    serving kernels, which a plain GSPMD jit would replicate — with no
    cross-device communication (beam search is row-independent). Params
    and the prefix table are replicated; the batch must divide the mesh
    axis. Sampled-candidate mode folds the device's axis index into the
    rng so shards draw independent noise.

    The reference's eval/generation is strictly per-process
    (/root/reference/train_decoder.py:221-246); this is the scale-out
    serving equivalent.

    Returns fn(params, sem_ids, seq_mask, user_ids, prefix_table, rng)
    -> GenerationOutput (rng may be None when not sampling)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    model = _promote_serving_gates(model)
    sampled = model.config.sample_candidates

    def gen_shard(params, sem_ids, seq_mask, user_ids, prefix_table, rng):
        if sampled:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return model.apply(
            params, sem_ids, seq_mask, user_ids, prefix_table,
            rng if sampled else None,
            method=EncoderDecoderRetrievalModel.generate,
        )

    smapped = shard_map(
        gen_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )

    def generate(params, sem_ids, seq_mask, user_ids, prefix_table, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)  # unused when not sampling
        return smapped(params, sem_ids, seq_mask, user_ids, prefix_table, rng)

    return generate


class Retriever:
    """history (item ids) -> top-k item ids. Build directly or via
    `Retriever.from_checkpoints(rqvae_ckpt, decoder_ckpt, item_features)`."""

    @classmethod
    def from_checkpoints(
        cls,
        rqvae_checkpoint: str,
        decoder_checkpoint: str,
        item_features,
        tokenize_batch_size: int = 8192,
        capacity: Optional[int] = None,
        index_path: Optional[str] = None,
    ) -> "Retriever":
        """Load both stage checkpoints, build the corpus index, and return
        a ready-to-serve retriever.

        `index_path`: persisted corpus index (SemanticIdTokenizer.save_index).
        If it exists, startup skips the full-corpus tokenization (the file is
        fingerprint-checked against the RQ-VAE); otherwise the index is built
        and saved there for the next start."""
        import jax as _jax
        import numpy as _np

        from rqvae_tpu.data.schemas import TokenizedSeqBatch
        from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
        from rqvae_tpu.models.retrieval import RetrievalConfig
        from rqvae_tpu.utils import checkpoint as ckpt_lib

        restored = ckpt_lib.load_checkpoint(rqvae_checkpoint)
        vae_cfg = restored["config"]
        assert isinstance(vae_cfg, RqVaeConfig), "not an RQ-VAE checkpoint"
        rq_model = RqVae(vae_cfg)
        x0 = jnp.asarray(np.asarray(item_features)[:2])
        template = rq_model.init(
            {"params": _jax.random.PRNGKey(0), "gumbel": _jax.random.PRNGKey(1)},
            x0,
            0.2,
            training=True,
        )
        rq_params = ckpt_lib.load_checkpoint(rqvae_checkpoint, params_template=template)["params"]
        import os as _os

        tokenizer = SemanticIdTokenizer(rq_model, rq_params, tokenize_batch_size=tokenize_batch_size)
        if index_path is not None and _os.path.exists(index_path):
            tokenizer.load_index(index_path)
        else:
            tokenizer.precompute_corpus_ids(np.asarray(item_features))
            if index_path is not None:
                tokenizer.save_index(index_path)

        dec_restored = ckpt_lib.load_checkpoint(decoder_checkpoint)
        dec_cfg = dec_restored["config"]
        assert isinstance(dec_cfg, RetrievalConfig), "not a decoder checkpoint"
        model = EncoderDecoderRetrievalModel(dec_cfg)
        D = dec_cfg.num_hierarchies + 1
        example = TokenizedSeqBatch(
            user_ids=jnp.zeros(1, jnp.int32),
            sem_ids=jnp.zeros((1, D), jnp.int32),
            sem_ids_fut=jnp.zeros((1, D), jnp.int32),
            seq_mask=jnp.ones((1, D), bool),
            token_type_ids=jnp.zeros((1, D), jnp.int32),
            token_type_ids_fut=jnp.zeros((1, D), jnp.int32),
        )
        dec_template = model.init(
            {"params": _jax.random.PRNGKey(0), "dropout": _jax.random.PRNGKey(1)},
            example,
            training=True,
        )
        params = ckpt_lib.load_checkpoint(decoder_checkpoint, params_template=dec_template)[
            "params"
        ]
        return cls(model, params, tokenizer, capacity=capacity)

    def __init__(
        self,
        model: EncoderDecoderRetrievalModel,
        params,
        tokenizer: SemanticIdTokenizer,
        seed: Optional[int] = None,
        mesh=None,  # jax.sharding.Mesh: shard the query batch over `mesh_axis`
        mesh_axis: str = "data",
        capacity: Optional[int] = None,  # max corpus size served; enables extend_corpus
    ):
        if tokenizer.cached_ids is None:
            raise ValueError("Tokenizer has no corpus index; call precompute_corpus_ids first")
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # shard_map needs the batch to divide the mesh axis exactly
        self.batch_multiple = 1 if mesh is None else mesh.shape[mesh_axis]
        # sampled-candidate mode draws fresh Gumbel noise per retrieve()
        # call (reference: torch.multinomial per call, model.py:345); a
        # fixed seed makes serving reproducible end-to-end
        import secrets

        self._rng = jax.random.PRNGKey(secrets.randbits(31) if seed is None else seed)

        L = model.config.num_hierarchies
        K = model.config.codebook_size
        self._n_items = tokenizer.cached_ids.shape[0]
        # capacity-padded STATIC shapes: extend_corpus can admit items up to
        # `capacity` without any serving-path recompile (all corpus-sized
        # arrays are jit ARGUMENTS below, never closure constants)
        self.capacity = self._n_items if capacity is None else int(capacity)
        assert self.capacity >= self._n_items, "capacity below current corpus size"
        self._rebuild_corpus_state()

        if mesh is not None:
            # scale-out serving: batch-sharded generate with the Pallas
            # kernels running per-shard (beam search is row-independent,
            # so the shard_map needs zero collectives); the searchsorted
            # inverse lookup below stays in the outer jit — it's a plain
            # gather, GSPMD-friendly
            run_gen = make_shardmap_generate(model, mesh, mesh_axis)
        else:

            def run_gen(params, sem_ids, seq_mask, user_ids, prefix_table, rng):
                return model.apply(
                    params, sem_ids, seq_mask, user_ids, prefix_table, rng,
                    method=EncoderDecoderRetrievalModel.generate,
                )

        from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

        @jax.jit
        def _query(params, table, ids, user_ids, rng,
                   prefix_table, sorted_keys, sorted_items):
            # tokenization is fused INTO the query program: one dispatch per
            # retrieve() instead of two — on remoted runtimes each dispatch
            # costs a transport round trip, which dominated the measured
            # serving-queue latency (benchmarks/slo_bench.py, RESULTS r4)
            tok = _tokenize_from_cache(
                table, user_ids, ids, jnp.zeros_like(user_ids), ids >= 0
            )
            gen = run_gen(params, tok.sem_ids, tok.seq_mask, tok.user_ids,
                          prefix_table, rng)
            tuple_keys = pack_sem_id_tuples(gen.sem_ids, K)  # [B, k]
            idx = jnp.clip(
                jnp.searchsorted(sorted_keys, tuple_keys, side="left"),
                0,
                sorted_keys.shape[0] - 1,
            )
            found = sorted_keys[idx] == tuple_keys
            items = jnp.where(found, sorted_items[idx], -1)
            return RetrievalResult(item_ids=items, sem_ids=gen.sem_ids, log_probas=gen.log_probas)

        self._query = _query

    def _rebuild_corpus_state(self) -> None:
        """(Re)derive all capacity-padded corpus-indexed state from the
        tokenizer's cached_ids: the tokenize lookup table, the prefix trie,
        and the tuple-key -> earliest-item inverse lookup."""
        L = self.model.config.num_hierarchies
        K = self.model.config.codebook_size
        cached = self.tokenizer.cached_ids
        n, D = cached.shape
        cap = self.capacity
        self.prefix_table = build_prefix_table(cached[:, :L], K, capacity=cap)
        # tokenize table: pad rows are all-zero and only reachable by item
        # ids >= n_items, which callers must not send before admitting them
        self._table = jnp.zeros((cap, D), cached.dtype).at[:n].set(cached)
        # corpus-order packed keys, sentinel-padded (sentinel = dtype max:
        # sorts last, never equals a valid key — see serving/beam.py)
        keys = pack_sem_id_tuples(cached[:, :L], K)
        from rqvae_tpu.serving.beam import _sentinel

        self._sentinel = _sentinel(keys.dtype)
        self._keys_cap = jnp.full((cap,), self._sentinel, keys.dtype).at[:n].set(keys)
        self._resort_inverse()

    def _resort_inverse(self) -> None:
        """sorted (key, earliest item) view of _keys_cap; stable argsort
        keeps corpus order as the tiebreaker, so duplicate tuples resolve
        to the earliest item (dedup column 0), like the reference's
        exhaustive compare would."""
        order = jnp.argsort(self._keys_cap, stable=True)
        self._sorted_keys = self._keys_cap[order]
        self._sorted_items = jnp.where(
            self._sorted_keys != self._sentinel, order, -1
        ).astype(jnp.int32)

    @property
    def n_items(self) -> int:
        """Items currently admitted (corpus ids [0, n_items) are servable)."""
        return self._n_items

    def extend_corpus(self, new_features) -> int:
        """Admit new catalog items into live serving: tokenize them with
        the frozen RQ-VAE, extend the dedup'd ID table (exact full-rebuild
        semantics — tokenizer.extend_corpus_ids), and update the serving
        index IN PLACE at static shapes, so no serving program recompiles
        (locked by tests/test_corpus_extension.py). The reference can only
        rebuild its index from scratch between training runs.

        Update order matters for concurrent serving (serving/queue.py runs
        retrieve() on a worker thread): (1) tokenize table, (2) inverse
        item lookup, (3) prefix trie LAST — the trie is what admits new
        tuples into generation, so a query racing the update sees either
        the old corpus or a fully consistent new one, never a beam it
        cannot map back to an item.

        Composes with scale-out serving: a mesh-sharded Retriever (and/or a
        tokenizer whose FULL-corpus build ran mesh-sharded) extends the same
        way — extend_corpus_ids always encodes the (small) extension batch
        unsharded, and every serving-state update below is a functional
        jnp update on replicated arrays, which the shard_map query program
        consumes via its replicated in_specs (locked by
        tests/test_corpus_extension.py::test_mesh_sharded_extension).

        Returns the new corpus size."""
        new_rows = self.tokenizer.extend_corpus_ids(new_features)
        m = new_rows.shape[0]
        n_old, n_new = self._n_items, self._n_items + m
        if n_new > self.capacity:
            raise ValueError(
                f"corpus extension to {n_new} items exceeds capacity "
                f"{self.capacity}; rebuild the Retriever with more headroom"
            )
        L = self.model.config.num_hierarchies
        K = self.model.config.codebook_size
        # (1) histories containing the new item ids tokenize correctly
        self._table = self._table.at[n_old:n_new].set(new_rows)
        # (2) generated tuples map back to items (new tuples unreachable yet)
        new_keys = pack_sem_id_tuples(new_rows[:, :L], K)
        self._keys_cap = self._keys_cap.at[n_old:n_new].set(new_keys)
        self._resort_inverse()
        # (3) admit the new tuples into constrained generation
        self.prefix_table = extend_prefix_table(
            self.prefix_table, new_rows[:, :L], K, n_valid_old=n_old
        )
        self._n_items = n_new
        return n_new

    def retrieve(
        self,
        item_id_history: np.ndarray,  # [B, N] item ids, -1 padded
        user_ids: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> RetrievalResult:
        hist = jnp.asarray(item_id_history, jnp.int32)
        B, N = hist.shape
        if user_ids is None:
            user_ids = np.zeros((B,), np.int32)
        if self.model.config.sample_candidates and rng is None:
            # advance internal state: each call must sample fresh noise
            # (a fixed key would silently freeze the candidate sets)
            self._rng, rng = jax.random.split(self._rng)
        # the query program tokenizes against the capacity-padded table
        # internally (NOT tokenizer.__call__, whose program would recompile
        # when extend_corpus grows cached_ids) — one dispatch end to end
        return self._query(
            self.params, self._table, hist, jnp.asarray(user_ids, jnp.int32), rng,
            self.prefix_table, self._sorted_keys, self._sorted_items,
        )
