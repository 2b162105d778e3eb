"""Import reference PyTorch checkpoints into rqvae_tpu params.

The RQ-VAE checkpoint is the contract between the two training stages
(SURVEY.md §5.4). A user of the reference repo has `.pt` files produced by
torch.save({iter, model: state_dict, model_config, optimizer})
(reference train_rqvae.py:259-270) — this module converts them into our
flax param pytrees so existing tokenizers keep working after switching
frameworks.

Reference state_dict layout (modules/rqvae.py, modules/encoder.py,
modules/quantize.py):
    encoder.mlp.{i}.weight           [out, in]   (torch Linear stores W^T)
    decoder.mlp.{i}.weight           [out, in]
    layers.{l}.embedding.weight      [K, D]
    layers.{l}.out_proj.0.weight     [D, D]      (only when sim_vq)

Ours (models/rqvae.py):
    params/encoder/dense_{j}/kernel  [in, out]
    params/decoder/dense_{j}/kernel  [in, out]
    params/codebooks                 [L, K, D]
    params/out_proj                  [L, D, D]   (sim_vq)

Conversion: transpose Linear weights, stack codebooks. The nn.Sequential
index i counts ReLU/Dropout modules too, so Linear layers are matched by
the sorted numeric order of entries that have a 2-D weight.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _seq_linears(state: Dict[str, "np.ndarray"], prefix: str) -> list:
    """Collect `{prefix}.{i}.weight` 2-D tensors in ascending i order."""
    found = []
    for key, val in state.items():
        if key.startswith(prefix + ".") and key.endswith(".weight") and val.ndim == 2:
            i = int(key[len(prefix) + 1 : -len(".weight")])
            found.append((i, val))
    return [v for _, v in sorted(found)]


def rqvae_params_from_torch_state(state_dict: Dict, n_layers: int) -> dict:
    """state_dict: torch state dict (tensors or arrays) -> flax params dict
    {'params': {...}} matching models/rqvae.RqVae."""
    state = {k: np.asarray(getattr(v, "cpu", lambda: v)().numpy() if hasattr(v, "numpy") else v)
             for k, v in state_dict.items()}

    def mlp_params(prefix):
        linears = _seq_linears(state, prefix)
        return {f"dense_{j}": {"kernel": w.T.copy()} for j, w in enumerate(linears)}

    params = {
        "encoder": mlp_params("encoder.mlp"),
        "decoder": mlp_params("decoder.mlp"),
        "codebooks": np.stack(
            [state[f"layers.{l}.embedding.weight"] for l in range(n_layers)]
        ),
    }
    if "layers.0.out_proj.0.weight" in state:
        params["out_proj"] = np.stack(
            [state[f"layers.{l}.out_proj.0.weight"].T for l in range(n_layers)]
        )
    return {"params": params}


def load_reference_rqvae_checkpoint(path: str):
    """Load a reference `.pt` checkpoint -> (RqVaeConfig, params, step).

    Requires torch (CPU) to unpickle; the reference saves model_config as
    the RqVae.__init__ locals() dict (rqvae.py:52)."""
    import torch

    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.models.rqvae import RqVaeConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg_raw = ckpt.get("model_config", {})

    def _mode(m):
        if m is None:
            return QuantizeForwardMode.GUMBEL_SOFTMAX
        name = getattr(m, "name", str(m).split(".")[-1])
        return QuantizeForwardMode[name]

    cfg = RqVaeConfig(
        input_dim=cfg_raw.get("input_dim", 768),
        embed_dim=cfg_raw.get("embed_dim", 32),
        hidden_dims=tuple(cfg_raw.get("hidden_dims", (512, 256, 128))),
        codebook_size=cfg_raw.get("codebook_size", 256),
        n_layers=cfg_raw.get("n_layers", 3),
        commitment_weight=cfg_raw.get("commitment_weight", 0.25),
        n_cat_feats=cfg_raw.get("n_cat_features", 0),
        codebook_normalize=cfg_raw.get("codebook_normalize", False),
        sim_vq=cfg_raw.get("codebook_sim_vq", False),
        codebook_mode=_mode(cfg_raw.get("codebook_mode")),
    )
    state = ckpt["model"]
    # strip torch.compile / DDP wrappers ("_orig_mod.", "module.")
    state = {k.replace("_orig_mod.", "").replace("module.", ""): v for k, v in state.items()}
    params = rqvae_params_from_torch_state(state, cfg.n_layers)
    return cfg, params, int(ckpt.get("iter", 0))


def convert_reference_checkpoint(src: str, dst_dir: str) -> str:
    """CLI-facing: reference .pt -> our msgpack checkpoint format."""
    from rqvae_tpu.utils.checkpoint import save_checkpoint

    cfg, params, step = load_reference_rqvae_checkpoint(src)
    return save_checkpoint(dst_dir, step, params, None, cfg)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Convert a reference RQ-VAE .pt checkpoint")
    ap.add_argument("src")
    ap.add_argument("dst_dir")
    args = ap.parse_args()
    print(convert_reference_checkpoint(args.src, args.dst_dir))


if __name__ == "__main__":
    main()
