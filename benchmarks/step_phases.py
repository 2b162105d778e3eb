"""Stage-2 train-step anatomy via fold-proof differential timing.

Nested programs at the flagship Amazon geometry (batch 640, d_model 384,
4 layers, bf16, dropout 0.1, fused kernels on):

  fwd loss            — model forward + loss only
  fwd+bwd grads       — value_and_grad
  full step           — grads + AdamW update (donated state excluded:
                        params perturbation provides the serial dependency)

Each program runs r serially-dependent iterations inside one fori_loop jit;
per-iteration time is the slope between two trip counts (bench.py
`_differential_time` — cancels tunnel RTT).

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/step_phases.py [off|on]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from bench import _differential_time
from ab_stage2_step import make_batch, B, L, K, N_ITEMS  # noqa: E402
from rqvae_tpu.models.retrieval import EncoderDecoderRetrievalModel, RetrievalConfig


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "on"
    bsz, n_items = B, N_ITEMS
    if "--batch" in sys.argv:
        bsz = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--items" in sys.argv:
        n_items = int(sys.argv[sys.argv.index("--items") + 1])
    cfg = RetrievalConfig(
        num_hierarchies=L, codebook_size=K, t5_d_model=384, t5_num_heads=6,
        t5_d_ff=1024, t5_num_layers=4, t5_dropout=0.1, top_k_for_generation=10,
        t5_dtype="bfloat16", t5_fused_attention=mode,
    )
    model = EncoderDecoderRetrievalModel(cfg)
    batch = make_batch(bsz, n_items)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, training=True
    )
    tx = optax.adamw(1e-3, weight_decay=0.01)
    opt_state = tx.init(params)

    def loss_fn(p, seed):
        out = model.apply(
            p, batch, training=True, rngs={"dropout": jax.random.key(seed, impl="rbg")}
        )
        return out.loss

    def perturbed(p, c):
        eps = c * jnp.float32(1e-30)
        return jax.tree_util.tree_map(lambda w: (w + eps.astype(w.dtype)), p)

    def fwd(p, c):
        return loss_fn(perturbed(p, c), c.astype(jnp.int32))

    def grads(p, c):
        _, g = jax.value_and_grad(loss_fn)(perturbed(p, c), c.astype(jnp.int32))
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(g))

    def full(p, c):
        l, g = jax.value_and_grad(loss_fn)(perturbed(p, c), c.astype(jnp.int32))
        upd, _ = tx.update(g, opt_state, p)
        new_p = optax.apply_updates(p, upd)
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(new_p))

    print(f"mode={mode} backend={jax.default_backend()} batch={bsz} items={n_items}")
    for name, prog in (("fwd loss", fwd), ("fwd+bwd grads", grads), ("full step", full)):
        @jax.jit
        def amortized(p, r, prog=prog):
            return jax.lax.fori_loop(
                0, r, lambda _, c: prog(p, c).astype(jnp.float32), jnp.float32(0.0)
            )

        per = _differential_time(
            lambda r: float(amortized(params, jnp.int32(r))), r1=5, r2=55, reps=4
        )
        print(f"{name:14s}: {per * 1e3:7.2f} ms/iter ({bsz / per / 1e3:.1f}k ex/s)")


if __name__ == "__main__":
    main()
