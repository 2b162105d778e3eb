"""Index-build phase breakdown via fold-proof differential timing.

Differentially times (bench.py `_differential_time`) three nested programs
at the bench geometry (N=65,536, 768 -> [512,256,128] -> 32, 3x256,
Pallas b512 bf16): kernel-only encode+quantize, + key packing, and the
full build (+ sort-dedup + concat). Supersedes the round-2 phase table
measured with per-iteration dependency-injection copies.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/token_phases.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _differential_time, _make_corpus, N_ITEMS, INPUT_DIM, HIDDEN, EMBED, K, L
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig, kmeans_init_codebooks
from rqvae_tpu.ops.dedup import dedup_counts_from_keys, pack_sem_id_tuples
from rqvae_tpu.ops.pallas.rq_encode import encoder_weights_from_params, fused_encode_quantize
from rqvae_tpu.tokenizer.semids import SemanticIdTokenizer


def main():
    cfg = RqVaeConfig(
        input_dim=INPUT_DIM, embed_dim=EMBED, hidden_dims=tuple(HIDDEN),
        codebook_size=K, n_layers=L, n_cat_feats=0,
        codebook_mode=QuantizeForwardMode.STE,
    )
    model = RqVae(cfg)
    corpus = _make_corpus()
    x0 = jnp.asarray(corpus[:4096])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}, x0, 0.2, training=True
    )
    params = kmeans_init_codebooks(jax.random.PRNGKey(2), model, params, x0)
    tok = SemanticIdTokenizer(model, params, tokenize_batch_size=8192)
    tok.precompute_corpus_ids(corpus)  # compile + cache device corpus
    x, build = tok._corpus_dev, tok._build_index
    n = N_ITEMS

    def perturbed(p, c):
        eps = c.astype(jnp.float32) * jnp.float32(1e-30)
        return jax.tree_util.tree_map(lambda w: w + eps.astype(w.dtype), p)

    def kernel_only(p):
        return fused_encode_quantize(
            x, encoder_weights_from_params(p), p["params"]["codebooks"],
            n_levels=cfg.n_layers, block_rows=512, precision="bf16",
        )[:n]

    programs = {
        "kernel only": lambda p: jnp.min(kernel_only(p)),
        "kernel + pack": lambda p: jnp.min(pack_sem_id_tuples(kernel_only(p), K)),
        "kernel + pack + dedup": lambda p: jnp.min(
            dedup_counts_from_keys(pack_sem_id_tuples(kernel_only(p), K))
        ),
        "full build": lambda p: jnp.min(build(p, x)),
    }
    for name, prog in programs.items():
        @jax.jit
        def amortized(p, r, prog=prog):
            return jax.lax.fori_loop(0, r, lambda _, c: prog(perturbed(p, c)), jnp.int32(0))

        per = _differential_time(lambda r: int(amortized(params, jnp.int32(r))))
        print(f"{name:24s}: {per * 1e3:7.3f} ms/iter => {n / per / 1e6:6.1f}M items/s")


if __name__ == "__main__":
    main()
