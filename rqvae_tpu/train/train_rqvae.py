"""Stage-1 trainer: RQ-VAE tokenizer training.

Reference parity: /root/reference/train_rqvae.py — same knob surface
(train_rqvae.py:24-55), k-means warm start on a <=20k-item sample at iter 0
(:178-183), gradient accumulation (:186-195), 1000-sample rolling loss
windows (:197-206), eval-loss cadence (:236-256), ID-diversity metrics
(codebook usage / tuple entropy / max duplicates, :272-292), checkpoint +
resume (:144-151, :258-270).

TPU-first: one jitted train step (forward+backward+AdamW fused, donated
state) over a ('data','model') mesh; the batch is sharded on 'data' and
GSPMD inserts the gradient all-reduce. `amp=True` maps to bf16 matmuls
(TPU-native; no loss scaling needed).

CLI:  python -m rqvae_tpu.train.train_rqvae configs/rqvae_synthetic.gin
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.datasets import ItemDataset
from rqvae_tpu.data.registry import RecDataset, ensure_dataset
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import (
    RqVae,
    RqVaeConfig,
    kmeans_init_codebooks,
    restart_dead_codebook_entries,
)
from rqvae_tpu.ops.dedup import codebook_usage, pack_sem_id_tuples, tuple_entropy
from rqvae_tpu.ops.schedules import TemperatureScheduler
from rqvae_tpu.parallel import dist, mesh as mesh_lib
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer
from rqvae_tpu.train.rqvae_steps import (
    make_rqvae_eval_step,
    make_rqvae_index_train_step,
    make_rqvae_scan_train_step,
)
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.utils import checkpoint as ckpt_lib
from rqvae_tpu.utils.logging import MetricLogger


def train(
    iterations: int = 50000,
    batch_size: int = 64,
    learning_rate: float = 0.0001,
    weight_decay: float = 0.01,
    dataset_folder: str = "dataset/synthetic",
    dataset: RecDataset = RecDataset.SYNTHETIC,
    pretrained_rqvae_path: Optional[str] = None,
    save_dir_root: str = "out/rqvae/",
    use_kmeans_init: bool = True,
    split_batches: bool = True,  # accepted for config parity; GSPMD shards globally
    amp: bool = False,
    wandb_logging: bool = False,
    do_eval: bool = True,
    force_dataset_process: bool = False,
    mixed_precision_type: str = "bf16",  # fp16 configs map to bf16 on TPU
    gradient_accumulate_every: int = 1,
    save_model_every: int = 1_000_000,
    eval_every: int = 50000,
    commitment_weight: float = 0.25,
    vae_n_cat_feats: int = 18,
    vae_input_dim: int = 18,
    vae_embed_dim: int = 16,
    vae_hidden_dims: List[int] = [18, 18],
    vae_codebook_size: int = 32,
    vae_codebook_normalize: bool = False,
    vae_codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX,
    vae_sim_vq: bool = False,
    vae_n_layers: int = 3,
    dataset_split: str = "beauty",
    gumbel_temperature: float = 0.2,  # reference hard-codes t=0.2 (train_rqvae.py:177)
    # exponential temperature anneal (reference TemperatureScheduler,
    # distributions/gumbel.py:23-43 — shipped but unwired there; opt-in here)
    gumbel_anneal_rate: Optional[float] = None,
    gumbel_min_t: float = 0.05,
    gumbel_anneal_step_size: int = 1000,
    seed: int = 0,
    log_every: int = 100,
    kmeans_init_samples: int = 20000,
    # steps per jit dispatch: None = auto (gcd of cadences), 1 = per-step
    steps_per_loop: Optional[int] = None,
    # re-seed codebook entries unused on a corpus sample every N iters
    # (quality extension beyond the reference; None = off)
    codebook_restart_every: Optional[int] = None,
    # stop restarting after this iteration so the codebook settles before
    # the end of training (None = restart through the whole run)
    codebook_restart_until: Optional[int] = None,
    # resume from the latest checkpoint in save_dir_root if one exists
    auto_resume: bool = False,
) -> dict:
    """Returns a summary dict with final metrics and checkpoint path."""
    from rqvae_tpu.utils.debug import maybe_init_debug

    maybe_init_debug()
    dist.initialize_distributed()
    mesh = mesh_lib.make_mesh()
    is_main = dist.is_main_process()
    if amp:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    if auto_resume and pretrained_rqvae_path is None:
        pretrained_rqvae_path = ckpt_lib.latest_checkpoint(save_dir_root)
        if pretrained_rqvae_path and is_main:
            print(f"---Auto-resuming from {pretrained_rqvae_path}---")

    data = ensure_dataset(dataset_folder, dataset, split=dataset_split, force=force_dataset_process)
    train_items = ItemDataset(data, "train" if do_eval else "all")
    eval_items = ItemDataset(data, "eval") if do_eval else None
    index_items = ItemDataset(data, "all") if do_eval else train_items

    cfg = RqVaeConfig(
        input_dim=vae_input_dim,
        embed_dim=vae_embed_dim,
        hidden_dims=tuple(vae_hidden_dims),
        codebook_size=vae_codebook_size,
        n_layers=vae_n_layers,
        commitment_weight=commitment_weight,
        n_cat_feats=vae_n_cat_feats,
        codebook_normalize=vae_codebook_normalize,
        sim_vq=vae_sim_vq,
        codebook_mode=vae_codebook_mode,
    )
    model = RqVae(cfg)
    root_key = jax.random.PRNGKey(seed)
    init_x = jnp.asarray(train_items.head(max(batch_size, 2)))
    params = model.init(
        {"params": root_key, "gumbel": jax.random.fold_in(root_key, 1)},
        init_x,
        gumbel_temperature,
        training=True,
    )

    tx = adamw(learning_rate, weight_decay=weight_decay)
    start_iter = 0
    if pretrained_rqvae_path is not None:
        state0 = TrainState.create(params, tx)
        restored = ckpt_lib.load_checkpoint(
            pretrained_rqvae_path, params_template=params, opt_state_template=state0.opt_state
        )
        params = restored["params"]
        opt_state = restored.get("opt_state", state0.opt_state)
        start_iter = restored["step"] + 1
        print(f"---Loaded RQVAE iter {restored['step']}---")
        state = TrainState(params, opt_state, jnp.asarray(start_iter, jnp.int32))
    else:
        if use_kmeans_init:
            sample = train_items.head(kmeans_init_samples)
            params = kmeans_init_codebooks(
                jax.random.fold_in(root_key, 2), model, params, jnp.asarray(sample),
                # GUMBEL configs: level l>0 init sees soft-mixture residuals
                # at the iteration-0 temperature, as the reference's
                # mid-training-forward init does (train_rqvae.py:163,178)
                gumbel_temperature=(
                    gumbel_temperature
                    if vae_codebook_mode == QuantizeForwardMode.GUMBEL_SOFTMAX
                    else None
                ),
            )
        state = TrainState.create(params, tx)

    # replicate state over the mesh; batches are sharded on the data axis
    state = mesh_lib.replicate_pytree(mesh, state)
    batch_sh = mesh_lib.batch_sharding(mesh, batch_axis=1)  # [A, B] -> B sharded

    # device-resident training features: per-step host work is index
    # sampling only; the batch gather happens inside the jitted step
    features_dev = mesh_lib.replicate_pytree(mesh, jnp.asarray(train_items.features))
    train_step = make_rqvae_index_train_step(model, tx)
    eval_step = make_rqvae_eval_step(model)
    tokenizer = SemanticIdTokenizer(model, state.params)

    logger = MetricLogger(
        log_dir=os.path.join(save_dir_root, "logs"),
        use_wandb=wandb_logging,
        wandb_project="rq-vae-training",
        wandb_config={k: str(v) for k, v in locals().items() if isinstance(v, (int, float, str, bool))},
        is_main=is_main,
    )

    rng = np.random.RandomState(seed)
    t = gumbel_temperature
    t_sched = (
        TemperatureScheduler(
            t0=gumbel_temperature,
            min_t=gumbel_min_t,
            anneal_rate=gumbel_anneal_rate,
            step_size=gumbel_anneal_step_size,
        )
        if gumbel_anneal_rate is not None
        else None
    )
    t_start = time.time()
    summary: dict = {}
    ckpt_path = None

    # Chunked multi-step training: scan `spl` steps inside one jit with
    # on-device index sampling — one host dispatch per chunk. Required when
    # the runtime has per-dispatch latency (remoted TPUs). The temperature
    # anneal stays on this fast path: t is a pure function of step
    # (gumbel_temperature_at) computed inside the scan body.
    import math

    spl = 1
    if steps_per_loop != 1:
        cadences = [log_every, iterations, save_model_every]
        if do_eval:
            cadences.append(eval_every)
        if codebook_restart_every:
            cadences.append(codebook_restart_every)
        auto = math.gcd(*cadences)
        if steps_per_loop is None:
            # cap auto chunks: very long scan chunks have been observed to
            # crash remoted TPU workers, and 250-500 already amortizes
            # dispatch latency fully
            spl = max(1, math.gcd(auto, 500))
        else:
            spl = max(1, math.gcd(steps_per_loop, auto))
    if spl > 1:
        t_fn = None
        if t_sched is not None:
            from functools import partial

            from rqvae_tpu.ops.schedules import gumbel_temperature_at

            t_fn = partial(
                gumbel_temperature_at,
                t0=gumbel_temperature,
                min_t=gumbel_min_t,
                anneal_rate=gumbel_anneal_rate,
                step_size=gumbel_anneal_step_size,
            )
        scan_step = make_rqvae_scan_train_step(
            model, tx, n_steps=spl, accum=gradient_accumulate_every,
            batch_size=batch_size, mesh=mesh, t_fn=t_fn,
        )

    it = start_iter - 1
    while it + 1 < start_iter + iterations:
        if spl > 1:
            state, metrics = scan_step(state, features_dev, root_key, jnp.float32(t))
            it += spl
            if t_sched is not None:  # host mirror for logging / eval passes
                from rqvae_tpu.ops.schedules import gumbel_temperature_at

                t = float(
                    gumbel_temperature_at(
                        it, gumbel_temperature, gumbel_min_t,
                        gumbel_anneal_rate, gumbel_anneal_step_size,
                    )
                )
        else:
            it += 1
            if t_sched is not None:
                t = t_sched.get_t(it)
            idx = rng.randint(
                0, len(train_items), (gradient_accumulate_every, batch_size)
            ).astype(np.int32)
            idx = jax.device_put(idx, batch_sh)
            state, metrics = train_step(state, features_dev, idx, root_key, jnp.float32(t))

        if (it + 1) % log_every == 0 or it < start_iter + spl or it >= start_iter + iterations - 1:
            host_metrics = {
                k: float(v) for k, v in jax.device_get(metrics).items() if np.ndim(v) == 0
            }
            emb_norms = jax.device_get(metrics["emb_norms"])
            host_metrics.update({f"emb_avg_norm_{i}": float(v) for i, v in enumerate(emb_norms)})
            logger.push_rolling(
                {k: host_metrics[k] for k in ("total_loss", "reconstruction_loss", "rqvae_loss")}
            )
            roll = {f"rolling_{k}": v for k, v in logger.rolling_means().items()}
            logger.log(
                it,
                {**host_metrics, **roll, "temperature": t, "learning_rate": learning_rate},
                # this branch only runs at it = m*log_every - 1, so the
                # echo cadence must use (it+1) like train_decoder does
                echo=is_main and ((it + 1) % (log_every * 10) == 0),
            )
            summary.update(host_metrics)

        if codebook_restart_every and (it + 1) % codebook_restart_every == 0 and (
            it + 1 != start_iter + iterations
        ) and (codebook_restart_until is None or it < codebook_restart_until):
            sample = jnp.asarray(train_items.head(kmeans_init_samples))
            new_params, dead = restart_dead_codebook_entries(
                jax.random.fold_in(root_key, 777 + it), model, state.params, sample
            )
            state = TrainState(new_params, state.opt_state, state.step)
            logger.log(it, {f"restarted_codes_{i}": float(d) for i, d in enumerate(jax.device_get(dead))})

        do_cadence = (it + 1) % eval_every == 0 or it + 1 == start_iter + iterations
        if do_eval and do_cadence:
            eval_metrics = _run_eval(eval_step, state.params, eval_items, batch_size, t)
            diversity = _id_diversity_metrics(tokenizer, state.params, index_items, cfg)
            logger.log(it, {**eval_metrics, **diversity}, echo=is_main)
            summary.update(eval_metrics)
            summary.update(diversity)

        if is_main and ((it + 1) % save_model_every == 0 or it + 1 == start_iter + iterations):
            ckpt_path = ckpt_lib.save_checkpoint(
                save_dir_root, it, state.params, state.opt_state, cfg
            )

    summary["iterations_per_sec"] = iterations / max(time.time() - t_start, 1e-9)
    summary["checkpoint_path"] = ckpt_path
    logger.close()
    return summary


def _run_eval(eval_step, params, eval_items: ItemDataset, batch_size: int, t: float) -> dict:
    n = len(eval_items)
    sums, count = None, 0
    for s in range(0, n, batch_size):
        # the eval step returns batch MEANS: run the final short batch at
        # its exact size (one extra compiled shape) — padding it and
        # multiplying the padded mean by the true count biases every
        # metric toward the pad row
        x = eval_items.features[s : s + batch_size]
        m = jax.device_get(eval_step(params, jnp.asarray(x), jnp.float32(t)))
        w = x.shape[0]
        m = {k: float(v) * w for k, v in m.items()}
        sums = m if sums is None else {k: sums[k] + m[k] for k in m}
        count += w
    return {k: v / max(count, 1) for k, v in (sums or {}).items()}


def _id_diversity_metrics(
    tokenizer: SemanticIdTokenizer, params, index_items: ItemDataset, cfg: RqVaeConfig
) -> dict:
    """Codebook usage / tuple entropy / max duplicate fraction
    (reference train_rqvae.py:272-292)."""
    tokenizer.params = params
    tokenizer.reset()
    cached = tokenizer.precompute_corpus_ids(index_items.features)
    ids = cached[:, : cfg.n_layers]
    keys = pack_sem_id_tuples(ids, cfg.codebook_size)
    usage = jax.device_get(codebook_usage(ids, cfg.codebook_size))
    out = {f"codebook_usage_{i}": float(u) for i, u in enumerate(usage)}
    out["rqvae_entropy"] = float(tuple_entropy(keys))
    out["max_id_duplicates"] = float(cached[:, -1].max()) / cached.shape[0]
    return out


def main(argv: Optional[List[str]] = None) -> None:
    from rqvae_tpu.utils.config import apply_config

    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m rqvae_tpu.train.train_rqvae <config.gin>", file=sys.stderr)
        raise SystemExit(2)
    apply_config(train, argv[0])


if __name__ == "__main__":
    main()
