"""Export rqvae_tpu RQ-VAE params to a reference-format PyTorch checkpoint.

The inverse of utils/torch_import.py: a tokenizer trained here can be
dropped back into the reference repo (its stage-2 trainer loads `.pt`
files of torch.save({iter, model: state_dict, model_config}) — reference
train_rqvae.py:259-270, train_decoder.py:94-103), so interop runs both
directions.

Key layout written (reference modules/encoder.py:25-32 builds
nn.Sequential([Linear, ReLU] * hidden + [Linear, Identity]) with
dropout=0 in RqVae, so Linear modules sit at indices 0, 2, 4, ...):
    encoder.mlp.{2j}.weight          [out, in]   (torch Linear stores W^T)
    decoder.mlp.{2j}.weight          [out, in]
    layers.{l}.embedding.weight      [K, D]
    layers.{l}.out_proj.0.weight     [D, D]      (only when sim_vq)

model_config is written with plain-Python values only (the forward mode as
its enum NAME string) so the file unpickles in any environment — ours, the
reference's, or bare torch.

CLI: python -m rqvae_tpu.utils.torch_export <our_checkpoint.msgpack> <out.pt>
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def torch_state_from_rqvae_params(params: dict, n_layers: int) -> Dict[str, np.ndarray]:
    """Flax params {'params': {...}} -> reference-layout arrays (transposed
    back to torch's [out, in] Linear convention)."""
    p = params["params"]
    state: Dict[str, np.ndarray] = {}
    for ours, theirs in (("encoder", "encoder.mlp"), ("decoder", "decoder.mlp")):
        denses = sorted(
            (k for k in p[ours] if k.startswith("dense_")),
            key=lambda k: int(k.split("_")[1]),
        )
        for j, name in enumerate(denses):
            state[f"{theirs}.{2 * j}.weight"] = np.asarray(p[ours][name]["kernel"]).T.copy()
    codebooks = np.asarray(p["codebooks"])
    assert codebooks.shape[0] == n_layers, (codebooks.shape, n_layers)
    for l in range(n_layers):
        state[f"layers.{l}.embedding.weight"] = codebooks[l].copy()
    if "out_proj" in p:
        out_proj = np.asarray(p["out_proj"])
        for l in range(n_layers):
            state[f"layers.{l}.out_proj.0.weight"] = out_proj[l].T.copy()
    return state


def save_reference_checkpoint(cfg, params: dict, step: int, dst: str) -> str:
    """Write a reference-loadable .pt: {iter, model, model_config}."""
    import torch

    state = {
        k: torch.from_numpy(v) for k, v in
        torch_state_from_rqvae_params(params, cfg.n_layers).items()
    }
    model_config = {
        "input_dim": int(cfg.input_dim),
        "embed_dim": int(cfg.embed_dim),
        "hidden_dims": [int(d) for d in cfg.hidden_dims],
        "codebook_size": int(cfg.codebook_size),
        "n_layers": int(cfg.n_layers),
        "commitment_weight": float(cfg.commitment_weight),
        "n_cat_features": int(cfg.n_cat_feats),
        "codebook_normalize": bool(cfg.codebook_normalize),
        "codebook_sim_vq": bool(cfg.sim_vq),
        "codebook_mode": cfg.codebook_mode.name,  # plain string: portable pickle
    }
    torch.save({"iter": int(step), "model": state, "model_config": model_config}, dst)
    return dst


def export_checkpoint(src: str, dst: str) -> str:
    """CLI-facing: our msgpack checkpoint -> reference .pt."""
    from rqvae_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(src)
    cfg = ckpt["config"]
    if cfg is None:
        raise ValueError(f"{src} carries no RqVaeConfig; cannot export")
    return save_reference_checkpoint(cfg, ckpt["params"], ckpt["step"], dst)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Export an RQ-VAE checkpoint to reference .pt")
    ap.add_argument("src", help="our checkpoint .msgpack path")
    ap.add_argument("dst", help="output .pt path")
    args = ap.parse_args()
    print(export_checkpoint(args.src, args.dst))


if __name__ == "__main__":
    main()
