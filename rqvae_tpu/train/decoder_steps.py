"""Jitted train/eval/generate steps for the retrieval (decoder) stage.

Replaces the reference hot loop (train_decoder.py:175-207): tokenize ->
forward -> backward -> clip -> AdamW -> inv-sqrt LR, fused into one XLA
program with donated state. The LR schedule lives inside the optax chain
(reference steps the torch scheduler after each optimizer step,
train_decoder.py:205). Gradient accumulation (reference
train_decoder.py:181-187: loss / gradient_accumulate_every summed over
micro-batches == mean grads over micro-batches) is a lax.scan over `accum`
micro-batches inside the same jit. Per-batch sequence-length quantile
telemetry (reference modules/utils.py:25-44) is computed in-step from the
tokenized batch's seq_mask.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel
from rqvae_tpu.serving.beam import PrefixTable
from rqvae_tpu.train.state import TrainState

SEQ_LENGTH_QUANTILES = (0.25, 0.5, 0.75, 0.9, 1.0)


def _debug_metrics(batch: TokenizedSeqBatch) -> dict:
    """Per-batch seq-length quantiles (reference modules/utils.py:25-44:
    quantiles of batch.seq_mask.sum(axis=1))."""
    lengths = jnp.sum(batch.seq_mask, axis=1).astype(jnp.float32)
    return {
        f"seq_length_p{int(q * 100)}": jnp.quantile(lengths, q)
        for q in SEQ_LENGTH_QUANTILES
    }


def _make_loss_fn(model: EncoderDecoderRetrievalModel):
    def loss_fn(params, batch: TokenizedSeqBatch, key):
        out = model.apply(params, batch, training=True, rngs={"dropout": key})
        metrics = {"total_loss": out.loss, "loss_d": out.loss_d}
        metrics.update(_debug_metrics(batch))
        return out.loss, metrics

    return loss_fn


def make_decoder_train_step(model: EncoderDecoderRetrievalModel, tx: optax.GradientTransformation):
    grad_fn = jax.value_and_grad(_make_loss_fn(model), has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: TokenizedSeqBatch, key: jax.Array):
        (_, metrics), grads = grad_fn(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _make_batch_builder(max_seq_len: int, leave_two_out: bool, subsample: bool, mesh=None):
    """Shared micro-batch construction: on-device window (sub)sampling
    (reference data/processed.py:137-150 semantics) + cached-table
    tokenization (semids.py:119-146). Uniform draws come from the caller so
    ALL rng can be batched outside lax.scan."""
    from rqvae_tpu.data.jax_sampling import eval_windows, subsample_windows_from_draws
    from rqvae_tpu.tokenizer.semids import _tokenize_from_cache

    def constrain(x):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = [None] * x.ndim
            spec[0] = "data"
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
        return x

    def build(seq_items, seq_lengths, user_ids, cached_ids, row_idx, u_start, u_end):
        if subsample:
            hist, fut = subsample_windows_from_draws(
                u_start, u_end, seq_items, seq_lengths, row_idx, max_seq_len, leave_two_out
            )
        else:
            L = seq_lengths[row_idx]
            # clamp to 0, not 1: length-1 rows must target their only item
            # with an empty history (see datasets.SeqData.batch)
            hist_end = jnp.maximum(L - 2 if leave_two_out else L - 1, 0)
            hist, fut = eval_windows(seq_items, seq_lengths, row_idx, hist_end, max_seq_len)
        hist, fut = constrain(hist), constrain(fut)
        return _tokenize_from_cache(cached_ids, user_ids[row_idx], hist, fut, hist >= 0)

    return build


def _accumulated_grads(one_micro, row_idx, u_start, u_end, drop_seeds, accum):
    """Mean grads/metrics over `accum` micro-batches; inputs are [A, ...]
    stacks. Reference train_decoder.py:181-187 (loss / accum, summed)."""
    if accum == 1:
        (_, metrics), grads = one_micro(row_idx[0], u_start[0], u_end[0], drop_seeds[0])
        return grads, metrics

    def micro(carry, inp):
        g_acc, m_acc = carry
        (_, m), g = one_micro(*inp)
        return (
            jax.tree_util.tree_map(jnp.add, g_acc, g),
            jax.tree_util.tree_map(jnp.add, m_acc, m),
        ), None

    shapes = jax.eval_shape(one_micro, row_idx[0], u_start[0], u_end[0], drop_seeds[0])
    (_, m_shape), g_shape = shapes
    zeros = lambda tree: jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), tree)
    (grads, metrics), _ = jax.lax.scan(
        micro, (zeros(g_shape), zeros(m_shape)), (row_idx, u_start, u_end, drop_seeds)
    )
    grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
    metrics = jax.tree_util.tree_map(lambda m: m / accum, metrics)
    return grads, metrics


def make_decoder_fused_train_step(
    model: EncoderDecoderRetrievalModel,
    tx: optax.GradientTransformation,
    max_seq_len: int,
    leave_two_out: bool = True,
    subsample: bool = True,
    accum: int = 1,
):
    """Fully fused stage-2 step: on-device window subsampling (reference
    data/processed.py:137-150 semantics) + cached-table tokenization
    (semids.py:119-146) + forward/backward/AdamW over `accum` accumulated
    micro-batches, one XLA program.

    Per-iteration host work is sampling [accum*B] int32 row indices.
    Signature:
      step(state, seq_items [R,T], seq_lengths [R], user_ids [R],
           cached_ids [N, L+1], row_idx [accum*B], key)
    """
    build = _make_batch_builder(max_seq_len, leave_two_out, subsample)
    grad_fn = jax.value_and_grad(_make_loss_fn(model), has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, seq_items, seq_lengths, user_ids, cached_ids, row_idx, key):
        key = jax.random.fold_in(key, state.step)
        k_us, k_ue, k_drop = jax.random.split(key, 3)
        row_idx = row_idx.reshape(accum, -1)
        u_start = jax.random.uniform(k_us, row_idx.shape)
        u_end = jax.random.uniform(k_ue, row_idx.shape)
        # rbg dropout keys: threefry mask generation costs ~40% of the step
        drop_seeds = jax.random.randint(k_drop, (accum,), 0, 2**31 - 1)

        def one_micro(ri, us, ue, seed):
            batch = build(seq_items, seq_lengths, user_ids, cached_ids, ri, us, ue)
            return grad_fn(state.params, batch, jax.random.key(seed, impl="rbg"))

        grads, metrics = _accumulated_grads(
            one_micro, row_idx, u_start, u_end, drop_seeds, accum
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_decoder_scan_train_step(
    model: EncoderDecoderRetrievalModel,
    tx: optax.GradientTransformation,
    max_seq_len: int,
    n_steps: int,
    batch_size: int,
    leave_two_out: bool = True,
    subsample: bool = True,
    mesh=None,
    accum: int = 1,
):
    """Multi-step fused stage-2 training: lax.scan over n_steps of
    (on-device row sampling -> window subsample -> tokenize -> fwd/bwd ->
    AdamW), each step accumulating over `accum` micro-batches — one host
    dispatch per n_steps chunk. See make_decoder_fused_train_step for the
    single-step semantics."""
    build = _make_batch_builder(max_seq_len, leave_two_out, subsample, mesh=mesh)
    grad_fn = jax.value_and_grad(_make_loss_fn(model), has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, seq_items, seq_lengths, user_ids, cached_ids, key):
        n_rows = seq_items.shape[0]
        # ALL randomness drawn in batched calls before the scan (per-step
        # threefry inside a scan dominates the fused step cost)
        chunk_key = jax.random.fold_in(key, state.step)
        k_row, k_us, k_ue, k_drop = jax.random.split(chunk_key, 4)
        row_idx_all = jax.random.randint(k_row, (n_steps, accum, batch_size), 0, n_rows)
        u_start_all = jax.random.uniform(k_us, (n_steps, accum, batch_size))
        u_end_all = jax.random.uniform(k_ue, (n_steps, accum, batch_size))
        # dropout draws hundreds of millions of mask bits per step; the
        # default threefry costs ~40% of the whole train step on TPU, the
        # hardware-friendly rbg generator is ~free
        drop_seeds = jax.random.randint(k_drop, (n_steps, accum), 0, 2**31 - 1)

        def body(state, inp):
            row_idx, u_start, u_end, seeds = inp

            def one_micro(ri, us, ue, seed):
                batch = build(seq_items, seq_lengths, user_ids, cached_ids, ri, us, ue)
                return grad_fn(state.params, batch, jax.random.key(seed, impl="rbg"))

            grads, metrics = _accumulated_grads(
                one_micro, row_idx, u_start, u_end, seeds, accum
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        state, metrics = jax.lax.scan(
            body, state, (row_idx_all, u_start_all, u_end_all, drop_seeds)
        )
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), metrics)

    return multi_step


def make_decoder_shardmap_train_step(
    model: EncoderDecoderRetrievalModel,
    tx: optax.GradientTransformation,
    mesh,
    axis: str = "data",
):
    """Data-parallel stage-2 step via jax.shard_map: each device computes
    grads on its batch shard with ALL compute running per-shard — including
    the fused Pallas attention kernel, which a plain GSPMD jit would
    replicate (a pallas_call has no partitioning rule) — then pmean-reduces
    grads/metrics over the mesh axis. Optimizer update runs replicated
    outside the shard_map. Replaces the reference's Accelerate DDP
    all-reduce (reference train_decoder.py:73-76,194).

    Params must be replicated and the batch sharded over `axis` (dim 0).
    Dropout seeds fold in the device's axis index so shards draw
    independent masks.
    """
    from dataclasses import replace

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    # "auto" gates the fused kernel on device_count()==1 (under a plain
    # GSPMD jit a pallas_call would be replicated), which would silently
    # disable it HERE too — but per-shard execution is exactly what
    # shard_map guarantees, so promote to the explicit "on" override
    if model.config.t5_fused_attention == "auto" and jax.default_backend() == "tpu":
        model = type(model)(replace(model.config, t5_fused_attention="on"))

    grad_fn = jax.value_and_grad(_make_loss_fn(model), has_aux=True)

    def sharded_grads(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (_, metrics), grads = grad_fn(params, batch, key)
        return jax.lax.pmean(grads, axis), jax.lax.pmean(metrics, axis)

    smapped = shard_map(
        sharded_grads,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: TokenizedSeqBatch, key: jax.Array):
        grads, metrics = smapped(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_decoder_eval_step(model: EncoderDecoderRetrievalModel):
    @jax.jit
    def eval_step(params, batch: TokenizedSeqBatch):
        out = model.apply(params, batch, training=False)
        return {"eval_loss": out.loss, "eval_loss_d": out.loss_d}

    return eval_step


def make_generate_fn(model: EncoderDecoderRetrievalModel):
    """Returns generate(params, batch, prefix_table, rng=None) ->
    GenerationOutput, jitted (reference model.py:393-410)."""

    @jax.jit
    def generate(params, batch: TokenizedSeqBatch, prefix_table: PrefixTable, rng=None):
        return model.apply(
            params,
            batch.sem_ids,
            batch.seq_mask,
            batch.user_ids,
            prefix_table,
            rng,
            method=EncoderDecoderRetrievalModel.generate,
        )

    return generate
