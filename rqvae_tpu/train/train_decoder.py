"""Stage-2 trainer: retrieval (decoder) training over semantic-ID sequences.

Reference parity: /root/reference/train_decoder.py — same knob surface
(train_decoder.py:25-66), corpus tokenization before training (:124-125),
codebooks handed to the model for prefix validation (:131-136), inv-sqrt LR
with 10k warmup (:151), optional grad clipping (:202-203), partial
(loss-only) and full (generation + TopK metrics) eval cadences (:209-246),
checkpoint/resume incl. optimizer and schedule position (:153-162,
:248-260).

Unlike the reference, which hard-rejects non-Amazon datasets
(train_decoder.py:67-68), every registered dataset works here — the ML-32M
decoder path is live (SURVEY.md §5.6 flags the reference's as dead).

CLI:  python -m rqvae_tpu.train.train_decoder configs/decoder_synthetic.gin
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.datasets import ItemDataset, SeqDataset
from rqvae_tpu.data.registry import RecDataset, ensure_dataset
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.models.rqvae import RqVae
from rqvae_tpu.ops.metrics import TopKAccumulator
from rqvae_tpu.ops.schedules import inverse_sqrt_schedule
from rqvae_tpu.parallel import dist, mesh as mesh_lib
from rqvae_tpu.serving.beam import build_prefix_table
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer
from rqvae_tpu.train.decoder_steps import (
    make_decoder_eval_step,
    make_decoder_fused_train_step,
    make_decoder_scan_train_step,
    make_generate_fn,
)
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.utils import checkpoint as ckpt_lib
from rqvae_tpu.utils.logging import MetricLogger


def train(
    iterations: int = 500000,
    batch_size: int = 64,
    learning_rate: float = 0.001,
    weight_decay: float = 0.01,
    dataset_folder: str = "dataset/synthetic",
    save_dir_root: str = "out/decoder/",
    dataset: RecDataset = RecDataset.SYNTHETIC,
    pretrained_rqvae_path: Optional[str] = None,
    pretrained_decoder_path: Optional[str] = None,
    split_batches: bool = True,
    amp: bool = False,
    wandb_logging: bool = False,
    force_dataset_process: bool = False,
    mixed_precision_type: str = "bf16",
    gradient_accumulate_every: int = 1,
    save_model_every: int = 1_000_000,
    partial_eval_every: int = 1000,
    full_eval_every: int = 10000,
    vae_input_dim: int = 18,
    vae_embed_dim: int = 16,
    vae_hidden_dims: List[int] = [18, 18],
    vae_codebook_size: int = 32,
    vae_codebook_normalize: bool = False,
    vae_sim_vq: bool = False,
    vae_n_cat_feats: int = 18,
    vae_n_layers: int = 3,
    dataset_split: str = "beauty",
    push_vae_to_hf: bool = False,  # accepted for config parity; no Hub here
    train_data_subsample: bool = True,
    vae_hf_model_name: str = "",
    max_grad_norm: Optional[float] = None,
    t5_d_model: int = 128,
    t5_num_heads: int = 6,
    t5_d_ff: int = 1024,
    t5_num_layers: int = 4,
    top_k_for_generation: int = 10,
    should_add_sep_token: bool = True,
    num_user_bins: Optional[int] = None,
    top_k_eval_list: List[int] = [1, 5, 10],
    t5_dropout: float = 0.1,
    t5_dtype: str = "float32",
    t5_remat: bool = False,
    t5_fused_attention: str = "auto",  # Pallas attention: "auto"|"on"|"off"|"interpret"
    t5_fused_decode: str = "auto",  # Pallas decoder-stack serving kernel (full eval)
    t5_fused_encode: str = "auto",  # Pallas encoder-stack serving kernel (long rows)
    t5_hash_dropout: bool = True,  # counter-based dropout; False = flax nn.Dropout
    warmup_steps: int = 10000,
    sample_candidates: bool = False,
    full_eval_max_batches: Optional[int] = None,
    seed: int = 0,
    log_every: int = 100,
    # steps per jit dispatch: None = auto (gcd of cadences), 1 = per-step
    steps_per_loop: Optional[int] = None,
    # resume from the latest checkpoint in save_dir_root if one exists
    auto_resume: bool = False,
) -> dict:
    from rqvae_tpu.utils.debug import maybe_init_debug

    maybe_init_debug()
    dist.initialize_distributed()
    mesh = mesh_lib.make_mesh()
    is_main = dist.is_main_process()
    if amp:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    if auto_resume and pretrained_decoder_path is None:
        pretrained_decoder_path = ckpt_lib.latest_checkpoint(save_dir_root)
        if pretrained_decoder_path and is_main:
            print(f"---Auto-resuming from {pretrained_decoder_path}---")

    data = ensure_dataset(dataset_folder, dataset, split=dataset_split, force=force_dataset_process)
    item_dataset = ItemDataset(data, "all")
    train_dataset = SeqDataset(data, split="train", subsample=train_data_subsample)
    eval_dataset = SeqDataset(data, split="test")

    # --- frozen RQ-VAE + corpus index build (reference train_decoder.py:113-125) ---
    from rqvae_tpu.models.rqvae import RqVaeConfig
    from rqvae_tpu.models.quantize import QuantizeForwardMode

    if pretrained_rqvae_path is not None:
        restored = ckpt_lib.load_checkpoint(pretrained_rqvae_path)
        vae_cfg = restored["config"]
        if not isinstance(vae_cfg, RqVaeConfig):
            raise ValueError(f"{pretrained_rqvae_path} is not an RQ-VAE checkpoint")
        rq_model = RqVae(vae_cfg)
        x0 = jnp.asarray(item_dataset.head(2))
        template = rq_model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x0,
            0.2,
            training=True,
        )
        rq_params = ckpt_lib.load_checkpoint(pretrained_rqvae_path, params_template=template)[
            "params"
        ]
        print(f"---Loaded RQVAE iter {restored['step']}---")
    else:
        # untrained RQ-VAE (matches reference behavior when no weights given)
        vae_cfg = RqVaeConfig(
            input_dim=vae_input_dim,
            embed_dim=vae_embed_dim,
            hidden_dims=tuple(vae_hidden_dims),
            codebook_size=vae_codebook_size,
            n_layers=vae_n_layers,
            n_cat_feats=vae_n_cat_feats,
            codebook_normalize=vae_codebook_normalize,
            sim_vq=vae_sim_vq,
            codebook_mode=QuantizeForwardMode.STE,
        )
        rq_model = RqVae(vae_cfg)
        x0 = jnp.asarray(item_dataset.head(2))
        rq_params = rq_model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            x0,
            0.2,
            training=True,
        )

    tokenizer = SemanticIdTokenizer(rq_model, rq_params)
    cached_ids = tokenizer.precompute_corpus_ids(item_dataset.features)

    if push_vae_to_hf and is_main:
        # reference train_decoder.py:127-129 pushes the trained tokenizer
        from rqvae_tpu.utils import hub as hub_lib

        export_dir = hub_lib.save_pretrained(
            os.path.join(save_dir_root, "rqvae_export"), rq_params, vae_cfg
        )
        try:
            url = hub_lib.push_to_hub(export_dir, vae_hf_model_name or "rqvae-tokenizer")
            print(f"Pushed tokenizer to {url}")
        except Exception as e:  # no network / no login: keep the local export
            print(f"[hub] push failed ({e}); local export kept at {export_dir}")
    corpus_ids = cached_ids[:, : vae_cfg.n_layers]
    prefix_table = build_prefix_table(corpus_ids, vae_cfg.codebook_size)

    # --- retrieval model ---
    cfg = RetrievalConfig(
        num_hierarchies=vae_cfg.n_layers,
        codebook_size=vae_cfg.codebook_size,
        t5_d_model=t5_d_model,
        t5_num_heads=t5_num_heads,
        t5_d_ff=t5_d_ff,
        t5_num_layers=t5_num_layers,
        t5_dropout=t5_dropout,
        top_k_for_generation=top_k_for_generation,
        should_add_sep_token=should_add_sep_token,
        num_user_bins=num_user_bins,
        sample_candidates=sample_candidates,
        t5_dtype=t5_dtype,
        t5_remat=t5_remat,
        t5_fused_attention=t5_fused_attention,
        t5_fused_decode=t5_fused_decode,
        t5_fused_encode=t5_fused_encode,
        t5_hash_dropout=t5_hash_dropout,
    )
    model = EncoderDecoderRetrievalModel(cfg)

    rng = np.random.RandomState(seed)
    root_key = jax.random.PRNGKey(seed)
    example = tokenizer(train_dataset.sample_batch(rng, batch_size, with_features=False))
    params = model.init(
        {"params": root_key, "dropout": jax.random.fold_in(root_key, 1)}, example, training=True
    )
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    if is_main:
        print(f"Devices: {jax.device_count()}, Num Parameters: {int(n_params)}")

    tx = adamw(
        inverse_sqrt_schedule(learning_rate, warmup_steps),
        weight_decay=weight_decay,
        max_grad_norm=max_grad_norm,
    )
    start_iter = 0
    if pretrained_decoder_path is not None:
        state0 = TrainState.create(params, tx)
        restored = ckpt_lib.load_checkpoint(
            pretrained_decoder_path, params_template=params, opt_state_template=state0.opt_state
        )
        params, opt_state = restored["params"], restored["opt_state"]
        start_iter = restored["step"] + 1
        state = TrainState(params, opt_state, jnp.asarray(start_iter, jnp.int32))
    else:
        state = TrainState.create(params, tx)

    state = mesh_lib.replicate_pytree(mesh, state)
    batch_sh = mesh_lib.batch_sharding(mesh, batch_axis=0)

    # device-resident sequence store: per-step host work = sampling row
    # indices; window subsampling + tokenization + train fuse into one jit
    seq_items_dev = mesh_lib.replicate_pytree(mesh, jnp.asarray(train_dataset.seq_items))
    seq_lengths_dev = mesh_lib.replicate_pytree(mesh, jnp.asarray(train_dataset.seq_lengths))
    seq_users_dev = mesh_lib.replicate_pytree(mesh, jnp.asarray(train_dataset.user_ids))
    cached_ids_dev = mesh_lib.replicate_pytree(mesh, tokenizer.cached_ids)
    train_step = make_decoder_fused_train_step(
        model,
        tx,
        max_seq_len=train_dataset.max_seq_len,
        leave_two_out=(train_dataset.format == "leave_two_out"),
        subsample=train_data_subsample,
        accum=gradient_accumulate_every,
    )
    eval_step = make_decoder_eval_step(model)
    generate = make_generate_fn(model)
    accumulator = TopKAccumulator(ks=top_k_eval_list)

    logger = MetricLogger(
        log_dir=os.path.join(save_dir_root, "logs"),
        use_wandb=wandb_logging,
        wandb_project="gen-retrieval-decoder-training",
        is_main=is_main,
    )

    t_start = time.time()
    summary: dict = {}
    ckpt_path = None

    # chunked multi-step dispatch (see train_rqvae.py; same rationale)
    import math

    spl = 1
    if steps_per_loop != 1:
        cadences = [log_every, iterations, save_model_every, partial_eval_every, full_eval_every]
        auto = math.gcd(*cadences)
        if steps_per_loop is None:
            # cap auto chunks: very long scan chunks have been observed to
            # crash remoted TPU workers, and 250-500 already amortizes
            # dispatch latency fully
            spl = max(1, math.gcd(auto, 500))
        else:
            spl = max(1, math.gcd(steps_per_loop, auto))
    if spl > 1:
        scan_step = make_decoder_scan_train_step(
            model, tx, max_seq_len=train_dataset.max_seq_len, n_steps=spl,
            batch_size=batch_size, leave_two_out=(train_dataset.format == "leave_two_out"),
            subsample=train_data_subsample, mesh=mesh, accum=gradient_accumulate_every,
        )

    it = start_iter - 1
    while it + 1 < start_iter + iterations:
        if spl > 1:
            state, metrics = scan_step(
                state, seq_items_dev, seq_lengths_dev, seq_users_dev, cached_ids_dev, root_key
            )
            it += spl
        else:
            it += 1
            row_idx = jax.device_put(
                rng.randint(
                    0, len(train_dataset), gradient_accumulate_every * batch_size
                ).astype(np.int32),
                batch_sh,
            )
            state, metrics = train_step(
                state, seq_items_dev, seq_lengths_dev, seq_users_dev, cached_ids_dev, row_idx, root_key
            )

        if (it + 1) % log_every == 0 or it < start_iter + spl or it >= start_iter + iterations - 1:
            host = jax.device_get(metrics)
            log = {"total_loss": float(host["total_loss"])}
            log.update({f"loss_{d}": float(v) for d, v in enumerate(host["loss_d"])})
            # per-batch tokenized seq-length quantiles, computed in-step
            # (reference modules/utils.py:25-44)
            log.update(
                {f"train_{k}": float(v) for k, v in host.items() if k.startswith("seq_length_p")}
            )
            logger.push_rolling({"total_loss": log["total_loss"]})
            log["rolling_total_loss"] = logger.rolling_means().get("total_loss", 0.0)
            # current schedule value (pure fn of the update count; reference
            # logs it via wandb in train_decoder.py:206-212)
            log["learning_rate"] = float(
                inverse_sqrt_schedule(learning_rate, warmup_steps)(it)
            )
            logger.log(it, log, echo=is_main and (it + 1) % (log_every * 10) == 0)
            summary.update(log)

        if (it + 1) % partial_eval_every == 0:
            # pad_final=False: the eval step returns a batch MEAN, which a
            # padded final batch would bias toward its pad row
            ev, n_ev = 0.0, 0
            for eb, valid in eval_dataset.iter_eval_batches(
                batch_size, with_features=False, pad_final=False
            ):
                m = jax.device_get(eval_step(state.params, tokenizer(eb)))
                ev += float(m["eval_loss"]) * valid
                n_ev += valid
            summary["eval_loss"] = ev / max(n_ev, 1)
            logger.log(it, {"eval_loss": summary["eval_loss"]}, echo=is_main)

        if (it + 1) % full_eval_every == 0 or it + 1 == start_iter + iterations:
            accumulator.reset()
            for bi, (eb, valid) in enumerate(eval_dataset.iter_eval_batches(batch_size, with_features=False)):
                if full_eval_max_batches is not None and bi >= full_eval_max_batches:
                    break
                tok = tokenizer(eb)
                gen = generate(state.params, tok, prefix_table, jax.random.fold_in(root_key, 999 + bi))
                actual = tok.sem_ids_fut[:valid, : vae_cfg.n_layers]
                accumulator.accumulate(actual=actual, top_k=gen.sem_ids[:valid])
            eval_metrics = accumulator.reduce()
            if is_main:
                print({k: round(v, 5) for k, v in eval_metrics.items()})
            logger.log(it, eval_metrics, echo=False)
            summary.update(eval_metrics)

        if is_main and ((it + 1) % save_model_every == 0 or it + 1 == start_iter + iterations):
            ckpt_path = ckpt_lib.save_checkpoint(save_dir_root, it, state.params, state.opt_state, cfg)

    summary["iterations_per_sec"] = iterations / max(time.time() - t_start, 1e-9)
    summary["checkpoint_path"] = ckpt_path
    logger.close()
    return summary


def main(argv: Optional[List[str]] = None) -> None:
    from rqvae_tpu.utils.config import apply_config

    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m rqvae_tpu.train.train_decoder <config.gin>", file=sys.stderr)
        raise SystemExit(2)
    apply_config(train, argv[0])


if __name__ == "__main__":
    main()
