"""Quickstart: the full rqvae_tpu workflow in one script.

Runs hermetically on CPU or TPU (synthetic data; no downloads):

    python examples/quickstart.py

Covers: dataset generation -> stage-1 RQ-VAE training -> corpus index
build -> stage-2 retrieval training -> constrained-beam serving with the
Retriever API. Swap the SYNTHETIC dataset for AMAZON / ML_1M / ML_32M by
preprocessing real raw files first (see rqvae_tpu/data/*.py docstrings).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rqvae_tpu.data.datasets import ItemDataset, SeqDataset, load_processed
from rqvae_tpu.data.registry import RecDataset
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.serving.retriever import Retriever
from rqvae_tpu.train.train_decoder import train as train_decoder
from rqvae_tpu.train.train_rqvae import train as train_rqvae


def main(workdir: str | None = None, small: bool = True) -> None:
    workdir = workdir or tempfile.mkdtemp(prefix="rqvae_quickstart_")
    ds = os.path.join(workdir, "dataset")

    # ---- stage 1: train the RQ-VAE tokenizer --------------------------------
    # (synthetic data is generated on first use; every knob of the reference
    # trainer is available — see rqvae_tpu/train/train_rqvae.py)
    s1 = train_rqvae(
        iterations=300 if small else 4000,
        batch_size=128,
        learning_rate=1e-3,
        dataset_folder=ds,
        dataset=RecDataset.SYNTHETIC,
        save_dir_root=os.path.join(workdir, "rqvae"),
        vae_input_dim=64,
        vae_n_cat_feats=0,
        vae_hidden_dims=[128, 64],
        vae_embed_dim=16,
        vae_codebook_size=64,
        vae_n_layers=3,
        vae_codebook_mode=QuantizeForwardMode.STE,
        eval_every=150 if small else 2000,
        save_model_every=300 if small else 4000,
        codebook_restart_every=100 if small else 1000,
        codebook_restart_until=200 if small else 2000,
        log_every=50,
    )
    print(f"stage 1 done: recon={s1['eval_reconstruction_loss']:.4f} "
          f"entropy={s1['rqvae_entropy']:.2f} ckpt={s1['checkpoint_path']}")

    # ---- stage 2: train the retrieval decoder -------------------------------
    s2 = train_decoder(
        iterations=400 if small else 4000,
        batch_size=64,
        learning_rate=3e-3,
        dataset_folder=ds,
        dataset=RecDataset.SYNTHETIC,
        pretrained_rqvae_path=s1["checkpoint_path"],
        save_dir_root=os.path.join(workdir, "decoder"),
        t5_d_model=64,
        t5_num_heads=4,
        t5_d_ff=128,
        t5_num_layers=2,
        t5_dropout=0.1,
        top_k_for_generation=10,
        warmup_steps=100,
        partial_eval_every=200,
        full_eval_every=400 if small else 2000,
        save_model_every=400 if small else 4000,
        full_eval_max_batches=4,
        log_every=100,
    )
    print(f"stage 2 done: h@10={s2.get('h@10', float('nan')):.3f} "
          f"ndcg={s2.get('ndcg', float('nan')):.3f}")

    # ---- serving: history of item ids -> top-k item ids ---------------------
    data = load_processed(ds)
    # ItemDataset applies the dataset's feature_dim truncation — the same
    # features training indexed (raw item_features may be wider)
    feats = ItemDataset(data, "all").features
    retriever = Retriever.from_checkpoints(
        s1["checkpoint_path"], s2["checkpoint_path"], feats
    )
    test = SeqDataset(data, split="test")
    batch = test.batch(np.arange(4), with_features=False)
    result = retriever.retrieve(np.asarray(batch.ids), np.asarray(batch.user_ids))
    for b in range(4):
        print(f"user {int(batch.user_ids[b])}: history={list(np.asarray(batch.ids[b])[np.asarray(batch.ids[b]) >= 0][:6])}... "
              f"-> top-5 items {list(np.asarray(result.item_ids[b])[:5])} "
              f"(target was {int(batch.ids_fut[b])})")

    # ---- production front end: shape buckets + async micro-batching ---------
    # RetrievalEngine pins every request to a static (batch, items) bucket
    # shape (one cached XLA program each — steady-state serving never
    # recompiles); AsyncRetrievalEngine turns it into a service: submit()
    # returns a Future, a worker thread coalesces concurrent requests into
    # shared TPU dispatches (flush on bucket-fill or max_delay_ms).
    from rqvae_tpu.serving.engine import RetrievalEngine
    from rqvae_tpu.serving.queue import AsyncRetrievalEngine

    engine = RetrievalEngine(retriever, max_items=int(batch.ids.shape[1]))
    with AsyncRetrievalEngine(engine, max_delay_ms=5.0) as service:
        futures = [
            service.submit(np.asarray(batch.ids[b])[np.asarray(batch.ids[b]) >= 0],
                           int(batch.user_ids[b]))
            for b in range(4)
        ]
        served = [f.result(timeout=120) for f in futures]
    print(f"async service: {len(served)} requests in {service.flushes} TPU "
          f"flush(es); top-1 items {[int(s.item_ids[0]) for s in served]}")

    # ---- live catalog growth: admit new items without a rebuild -------------
    # Build the index over part of the catalog with headroom (capacity), then
    # extend_corpus() tokenizes the late arrivals with the frozen RQ-VAE and
    # splices them into the serving tables at static shapes — the compiled
    # query program is untouched (dedup semantics exactly match a rebuild).
    grow = Retriever.from_checkpoints(
        s1["checkpoint_path"], s2["checkpoint_path"], feats[:-16],
        capacity=len(feats),
    )
    grow.retrieve(np.asarray(batch.ids), np.asarray(batch.user_ids))  # compile
    programs = int(grow._query._cache_size())
    grow.extend_corpus(feats[-16:])
    grown = grow.retrieve(np.asarray(batch.ids), np.asarray(batch.user_ids))
    assert int(grow._query._cache_size()) == programs, "extension must not recompile"
    print(f"live extension: corpus {len(feats) - 16} -> {grow.n_items} items, "
          f"0 recompiles; top-1 now {[int(i) for i in np.asarray(grown.item_ids)[:, 0]]}")


if __name__ == "__main__":
    main()
