"""Semantic-ID tokenizer: full-corpus index build + sequence lookup.

Reference parity: /root/reference/modules/tokenizer/semids.py
- precompute_corpus_ids (semids.py:76-110): tokenize every corpus item with
  the frozen RQ-VAE and append a dedup column = count of earlier items with
  an identical L-tuple. The reference loops 512-item batches sequentially
  and does O(N^2) pairwise compares; here the whole corpus is tokenized in
  one jit (lax.map over fixed-size chunks, so it scales past VMEM) and the
  dedup column is a single O(N log N) sort (ops/dedup.py) with corpus order
  as the tiebreaker — semantics match exactly.
- forward/_tokenize_seq_batch_from_cached (semids.py:119-146): sequence
  tokenization is a table lookup, flattening [B, N] item ids to
  [B, N*(L+1)] semantic ids with -1 at padding, plus token_type_ids.

This is the "items/sec tokenized" benchmark path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import SeqBatch, TokenizedSeqBatch
from rqvae_tpu.models.rqvae import RqVae
from rqvae_tpu.ops.dedup import dedup_counts_from_keys, pack_sem_id_tuples


class SemanticIdTokenizer:
    """Owns a frozen RQ-VAE (params) and the cached corpus-ID table."""

    def __init__(
        self,
        model: RqVae,
        params,
        tokenize_batch_size: int = 8192,
        sharding: Optional[jax.sharding.Sharding] = None,
        mesh: Optional[jax.sharding.Mesh] = None,  # shard the index build over `mesh_axis`
        mesh_axis: str = "data",
        use_pallas: Optional[bool] = None,  # None = auto (TPU + supported config)
        # bf16 matmuls by default: on v5e, f32 dots inside Pallas lower to
        # ~13x slower code; the corpus index is self-consistent as long as
        # one precision is used throughout (ids are defined BY the
        # tokenizer). Set "f32" for exact argmin parity with the XLA path.
        pallas_precision: str = "bf16",
    ):
        self.model = model
        self.params = params
        self.tokenize_batch_size = tokenize_batch_size
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None and sharding is None:
            # corpus rows sharded over the mesh axis; the shard_map build
            # runs the encode per-shard (Pallas eligible — a plain GSPMD
            # jit would replicate a pallas_call) and only the O(N log N)
            # dedup sort sees the gathered ids
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))
        self.sharding = sharding
        self.cached_ids: Optional[jax.Array] = None  # [N, L+1]
        self._corpus_src = None  # host-array identity for device-corpus reuse
        self._corpus_dev: Optional[jax.Array] = None

        from rqvae_tpu.ops.pallas.rq_encode import pallas_supported

        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu" and pallas_supported(model.config)
        self.use_pallas = use_pallas
        self.pallas_precision = pallas_precision

        @jax.jit
        def _encode_chunk(params, x):
            out = model.apply(params, x, training=False, method=RqVae.get_semantic_ids)
            return out.sem_ids  # [b, L]

        self._encode_chunk = _encode_chunk

    @property
    def n_layers(self) -> int:
        return self.model.config.n_layers

    @property
    def sem_ids_dim(self) -> int:
        """Tokens per item including the dedup column (semids.py:73-74)."""
        return self.n_layers + 1

    def reset(self) -> None:
        self.cached_ids = None

    def encode_batch(self, x: jax.Array) -> jax.Array:
        """[B, D] features -> [B, L] semantic ids (no dedup column)."""
        return self._encode_chunk(self.params, x)

    def _device_corpus(self, item_features: np.ndarray, row_multiple: int) -> jax.Array:
        """Zero-pad rows to a multiple and cache the device transfer (a
        corpus is tokenized many times during training; re-uploading ~50MB
        per eval would dominate)."""
        n = item_features.shape[0]
        n_pad = (n + row_multiple - 1) // row_multiple * row_multiple
        if self._corpus_src is item_features and self._corpus_dev is not None and (
            self._corpus_dev.shape[0] == n_pad
        ):
            return self._corpus_dev
        x = np.zeros((n_pad, item_features.shape[1]), np.float32)
        x[:n] = item_features
        if self.sharding is not None:
            # corpus rows sharded over the mesh (e.g. the 'data' axis): the
            # encode runs data-parallel and GSPMD gathers for the global
            # dedup sort (SURVEY §5.7: the corpus tensors are the memory
            # axis worth sharding, not the tiny sequences)
            self._corpus_dev = jax.device_put(x, self.sharding)
        else:
            self._corpus_dev = jnp.asarray(x)
        self._corpus_src = item_features
        return self._corpus_dev

    def _build_index_fn(self, n: int, block: int):
        """One jitted program for the whole index build: encode (Pallas or
        XLA) -> pack -> sort-dedup -> concat. A single dispatch per pass —
        per-call dispatch overhead otherwise dominates on remoted runtimes."""
        cfg = self.model.config
        use_pallas = self.use_pallas
        precision = self.pallas_precision
        interpret = jax.default_backend() != "tpu"
        model = self.model
        if use_pallas:
            from rqvae_tpu.ops.pallas.rq_encode import (
                encoder_weights_from_params,
                fused_encode_quantize,
            )

        def encode(params, x):
            if use_pallas:
                return fused_encode_quantize(
                    x,
                    encoder_weights_from_params(params),
                    params["params"]["codebooks"],
                    n_levels=cfg.n_layers,
                    block_rows=block,
                    precision=precision,
                    interpret=interpret,
                )
            b = min(self.tokenize_batch_size, x.shape[0])
            return jax.lax.map(
                lambda xc: model.apply(
                    params, xc, training=False, method=RqVae.get_semantic_ids
                ).sem_ids,
                x.reshape(-1, b, x.shape[1]),
            ).reshape(-1, cfg.n_layers)

        if self.mesh is not None:
            # per-shard encode: rows are independent, so the shard_map needs
            # zero collectives and keeps the Pallas kernel per-device (the
            # corpus was padded to a multiple of block * n_shards, so every
            # shard sees whole blocks)
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            encode = shard_map(
                encode,
                mesh=self.mesh,
                in_specs=(P(), P(self.mesh_axis)),
                out_specs=P(self.mesh_axis),
                check_vma=False,
            )

        @jax.jit
        def build(params, x):
            ids = encode(params, x)[:n]
            keys = pack_sem_id_tuples(ids, cfg.codebook_size)
            dedup = dedup_counts_from_keys(keys)
            return jnp.concatenate([ids, dedup[:, None].astype(ids.dtype)], axis=1)

        return build

    def precompute_corpus_ids(self, item_features: np.ndarray) -> jax.Array:
        """Tokenize the whole corpus and build the dedup'd ID table [N, L+1]."""
        n = item_features.shape[0]
        # b512 measured ~6ms/65k items on v5e; b256 hits a slow Mosaic schedule
        block = 512 if self.use_pallas else min(self.tokenize_batch_size, n)
        # mesh build: every shard must see whole blocks (shard_map splits
        # the leading axis evenly over the mesh axis)
        n_shards = 1 if self.mesh is None else self.mesh.shape[self.mesh_axis]
        x = self._device_corpus(item_features, block * n_shards)
        cache_key = (n, block, x.shape[1])
        if getattr(self, "_build_cache_key", None) != cache_key:
            self._build_index = self._build_index_fn(n, block)
            self._build_cache_key = cache_key
        self.cached_ids = self._build_index(self.params, x)
        return self.cached_ids

    # ---- index persistence (serving startup without re-tokenization) ----

    def _index_fingerprint(self) -> np.ndarray:
        """Cheap identity of the (model, params) that defined the index:
        geometry plus codebook checksums. Guards load_index against pairing
        a stored index with a different RQ-VAE (wrong ids would silently
        poison retrieval)."""
        cfg = self.model.config
        cb = np.asarray(self.params["params"]["codebooks"], np.float64)
        return np.asarray(
            [float(cfg.n_layers), float(cfg.codebook_size), float(cb.shape[-1]),
             float(cb.sum()), float(np.abs(cb).sum())]
        )

    def save_index(self, path: str) -> None:
        """Persist the built corpus index (cached_ids + fingerprint). The
        reference re-tokenizes the corpus on every decoder-trainer start
        (/root/reference/train_decoder.py:125); with a saved index, serving
        startup skips the full-corpus encode entirely."""
        if self.cached_ids is None:
            raise RuntimeError("no corpus index built; nothing to save")
        np.savez_compressed(
            path,
            cached_ids=np.asarray(self.cached_ids),
            fingerprint=self._index_fingerprint(),
        )

    def load_index(self, path: str) -> jax.Array:
        """Load a save_index() artifact after verifying it was built by
        this tokenizer's RQ-VAE."""
        with np.load(path) as z:
            fp, cached = z["fingerprint"], z["cached_ids"]
        mine = self._index_fingerprint()
        if fp.shape != mine.shape or not np.allclose(fp, mine):
            raise ValueError(
                f"index at {path} was built by a different RQ-VAE "
                f"(fingerprint {fp} != {mine})"
            )
        self.cached_ids = jnp.asarray(cached)
        return self.cached_ids

    def extend_corpus_ids(self, new_features: np.ndarray) -> jax.Array:
        """Admit new items into an existing corpus index (live catalog
        growth — no reference counterpart: /root/reference's tokenizer only
        rebuilds from scratch, semids.py:76-110). Appends [M, L+1] rows to
        `cached_ids` whose dedup column matches a full rebuild EXACTLY:
        dedup[i] = (# existing corpus items with the same tuple)
                 + (# earlier items within this extension with the same
                    tuple), i.e. the reference's order-dependent count with
        the existing corpus as the prefix. Returns the new rows.

        The encode runs on the default device (a mesh-sharded build is for
        full-corpus throughput; extensions are small). One jitted program
        per (n_old, M) shape pair — extension-time compiles are fine, the
        SERVING path stays compiled (see serving/retriever.py::extend_corpus).
        """
        if self.cached_ids is None:
            raise RuntimeError("extend_corpus_ids needs an existing index; "
                               "call precompute_corpus_ids first")
        new_features = np.asarray(new_features, np.float32)
        m = new_features.shape[0]
        cfg = self.model.config
        L = cfg.n_layers
        block = 512 if self.use_pallas else min(self.tokenize_batch_size, m)
        m_pad = (m + block - 1) // block * block
        x = np.zeros((m_pad, new_features.shape[1]), np.float32)
        x[:m] = new_features

        cache_key = (self.cached_ids.shape[0], m, m_pad, block, x.shape[1])
        if getattr(self, "_extend_cache_key", None) != cache_key:
            build_one = self._build_index_fn_unsharded(m, block)

            @jax.jit
            def extend(params, x_new, old_ids):
                rows = build_one(params, x_new)  # [M, L+1]: ids + WITHIN-batch dedup
                keys = pack_sem_id_tuples(rows[:, :L], cfg.codebook_size)
                old_sorted = jnp.sort(pack_sem_id_tuples(old_ids[:, :L], cfg.codebook_size))
                lo = jnp.searchsorted(old_sorted, keys, side="left")
                hi = jnp.searchsorted(old_sorted, keys, side="right")
                dedup = rows[:, L] + (hi - lo).astype(rows.dtype)
                return jnp.concatenate([rows[:, :L], dedup[:, None]], axis=1)

            self._extend_index = extend
            self._extend_cache_key = cache_key
        new_rows = self._extend_index(self.params, jnp.asarray(x), self.cached_ids)
        self.cached_ids = jnp.concatenate([self.cached_ids, new_rows], axis=0)
        return new_rows

    def _build_index_fn_unsharded(self, n: int, block: int):
        """The single-device build program (encode -> pack -> dedup ->
        concat), regardless of any mesh configured for full-corpus builds."""
        mesh, self.mesh = self.mesh, None
        try:
            return self._build_index_fn(n, block)
        finally:
            self.mesh = mesh

    def __call__(self, batch: SeqBatch) -> TokenizedSeqBatch:
        """Tokenize a sequence batch by cached-table lookup (semids.py:119-146)."""
        if self.cached_ids is None:
            raise RuntimeError("Call precompute_corpus_ids before tokenizing sequences")
        return _tokenize_from_cache(
            self.cached_ids,
            batch.user_ids,
            jnp.asarray(batch.ids),
            jnp.asarray(batch.ids_fut),
            jnp.asarray(batch.seq_mask),
        )


@jax.jit
def _tokenize_from_cache(
    cached_ids: jax.Array,  # [N, D] with D = L+1
    user_ids: jax.Array,  # [B]
    ids: jax.Array,  # [B, N_seq] -1 padded
    ids_fut: jax.Array,  # [B]
    seq_mask: jax.Array,  # [B, N_seq] bool
) -> TokenizedSeqBatch:
    B, N_seq = ids.shape
    D = cached_ids.shape[1]
    sem = cached_ids[jnp.clip(ids, 0)]  # [B, N_seq, D]
    mask = jnp.repeat(seq_mask, D, axis=1)  # [B, N_seq*D]
    sem_ids = jnp.where(mask, sem.reshape(B, N_seq * D), -1)
    sem_ids_fut = cached_ids[jnp.clip(ids_fut, 0)].reshape(B, D)
    token_type_ids = jnp.tile(jnp.arange(D, dtype=jnp.int32), (B, N_seq))
    token_type_ids_fut = jnp.tile(jnp.arange(D, dtype=jnp.int32), (B, 1))
    return TokenizedSeqBatch(
        user_ids=user_ids,
        sem_ids=sem_ids,
        sem_ids_fut=sem_ids_fut,
        seq_mask=mask,
        token_type_ids=token_type_ids,
        token_type_ids_fut=token_type_ids_fut,
    )
