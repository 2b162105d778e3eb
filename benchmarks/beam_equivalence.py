"""Serving equivalence: constrained beam outputs with the fused-kernel
encoder (auto gate, long rows) vs the XLA path (off) on the SAME params
and batch. The two differ only by bf16 rounding inside attention; beam
search takes argmax-like decisions, so tiny score deltas can flip
low-margin beams — this measures the realized disagreement rate at the
ML-32M geometry.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/beam_equivalence.py [--items N] [--knob fused_attention|fused_decode]

--knob fused_decode instead A/Bs the fused decoder-stack serving kernel
(ops/pallas/decoder_stack.py, auto vs off) with the attention gate held
at auto on both sides.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig
from rqvae_tpu.serving.beam import build_prefix_table

B, K, L, D = 64, 256, 3, 4
CORPUS = 20000


def run_equivalence(knob="fused_attention", n_items=200):
    """Full-beam output equality, kernel-on vs XLA. Importable for
    one-process TPU sessions; returns the match-rate dict."""
    rng = np.random.RandomState(0)
    sem = rng.randint(0, K, (B, n_items * D))
    batch = TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 1000, B)),
        sem_ids=jnp.asarray(sem),
        sem_ids_fut=jnp.asarray(rng.randint(0, K, (B, D))),
        seq_mask=jnp.asarray(np.ones((B, n_items * D), bool)),
        token_type_ids=jnp.asarray(np.tile(np.arange(D), (B, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(D), (B, 1))),
    )
    corpus_ids = jnp.asarray(rng.randint(0, K, (CORPUS, L)), jnp.int32)
    table = build_prefix_table(corpus_ids, K)

    outs = {}
    # fused_decode/fused_encode "auto" declines until chip-proven: A/B "on"
    on = "on" if knob in ("fused_decode", "fused_encode") else "auto"
    for mode in (on, "off"):
        cfg = RetrievalConfig(
            num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
            t5_d_ff=1024, t5_num_layers=4, top_k_for_generation=10,
            t5_dtype="bfloat16",
            t5_fused_attention=mode if knob == "fused_attention" else "auto",
            t5_fused_decode=mode if knob == "fused_decode" else "auto",
            t5_fused_encode=mode if knob == "fused_encode" else "auto",
        )
        model = EncoderDecoderRetrievalModel(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, training=True,
        )

        @jax.jit
        def gen(params, batch, table):
            return model.apply(
                params, batch.sem_ids, batch.seq_mask, batch.user_ids, table, None,
                method=EncoderDecoderRetrievalModel.generate,
            )

        outs[mode] = np.asarray(gen(params, batch, table).sem_ids)  # [B, k, L]
        print(f"{knob}={mode}: generated {outs[mode].shape}", flush=True)

    a, b = outs[on], outs["off"]
    tuple_match = (a == b).all(axis=-1)  # [B, k]
    top1 = tuple_match[:, 0].mean()
    allk = tuple_match.mean()
    # set overlap ignoring rank (rank swaps among near-ties are benign)
    set_overlap = np.mean([
        len({tuple(t) for t in a[i]} & {tuple(t) for t in b[i]}) / a.shape[1]
        for i in range(a.shape[0])
    ])
    print(f"top-1 exact match: {top1:.4f}; all-k positional match: {allk:.4f}; "
          f"top-k SET overlap: {set_overlap:.4f}")
    return {"knob": knob, "items": n_items, "top1_match": float(top1),
            "allk_match": float(allk), "set_overlap": float(set_overlap)}


def main():
    n_items = 200
    if "--items" in sys.argv:
        n_items = int(sys.argv[sys.argv.index("--items") + 1])
    knob = "fused_attention"
    if "--knob" in sys.argv:
        knob = sys.argv[sys.argv.index("--knob") + 1]
    run_equivalence(knob, n_items)


if __name__ == "__main__":
    main()
