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


def _t5_stack_state(stack_params: dict, num_layers: int, is_decoder: bool,
                    prefix: str) -> Dict[str, np.ndarray]:
    """Our flax T5Stack params -> HF T5Stack state-dict arrays (the exact
    inverse of tests/test_t5_hf_parity.py::_port_weights: transpose Dense
    kernels back to torch's [out, in])."""
    out: Dict[str, np.ndarray] = {}
    for i in range(num_layers):
        b = stack_params[f"block_{i}"]
        p = f"{prefix}block.{i}.layer.0."
        out[p + "SelfAttention.q.weight"] = np.asarray(b["self_attn"]["q"]["kernel"]).T.copy()
        out[p + "SelfAttention.k.weight"] = np.asarray(b["self_attn"]["k"]["kernel"]).T.copy()
        out[p + "SelfAttention.v.weight"] = np.asarray(b["self_attn"]["v"]["kernel"]).T.copy()
        out[p + "SelfAttention.o.weight"] = np.asarray(b["self_attn"]["o"]["kernel"]).T.copy()
        if i == 0:
            out[p + "SelfAttention.relative_attention_bias.weight"] = np.asarray(
                b["self_attn"]["rel_bias"]
            ).copy()
        out[p + "layer_norm.weight"] = np.asarray(b["ln_self"]["weight"]).copy()
        li = 1
        if is_decoder:
            c = f"{prefix}block.{i}.layer.1."
            out[c + "EncDecAttention.q.weight"] = np.asarray(b["cross_attn"]["q"]["kernel"]).T.copy()
            out[c + "EncDecAttention.k.weight"] = np.asarray(b["cross_attn"]["k"]["kernel"]).T.copy()
            out[c + "EncDecAttention.v.weight"] = np.asarray(b["cross_attn"]["v"]["kernel"]).T.copy()
            out[c + "EncDecAttention.o.weight"] = np.asarray(b["cross_attn"]["o"]["kernel"]).T.copy()
            out[c + "layer_norm.weight"] = np.asarray(b["ln_cross"]["weight"]).copy()
            li = 2
        f = f"{prefix}block.{i}.layer.{li}."
        out[f + "DenseReluDense.wi.weight"] = np.asarray(b["ffn"]["wi"]["kernel"]).T.copy()
        out[f + "DenseReluDense.wo.weight"] = np.asarray(b["ffn"]["wo"]["kernel"]).T.copy()
        out[f + "layer_norm.weight"] = np.asarray(b["ln_ffn"]["weight"]).copy()
    out[f"{prefix}final_layer_norm.weight"] = np.asarray(stack_params["ln_final"]["weight"]).copy()
    return out


def reference_retrieval_state_from_params(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Our EncoderDecoderRetrievalModel params -> the reference
    `modules/model.py::EncoderDecoderRetrievalModel` state-dict layout
    (model.py:58-119): a decoder trained here drops into the reference's
    eval/serving code unmodified — the stage-2 counterpart of
    save_reference_checkpoint. `codebooks` (the corpus tuple table) is a
    registered buffer set at the reference model's construction, not a
    weight, so it is NOT part of this state dict.

    Load with strict=False: the reference's unused token-embedding stubs
    (encoder.shared / *.embed_tokens, never hit — both sides feed
    inputs_embeds) have no counterpart here."""
    p = params["params"]
    cfgl = cfg.num_hierarchies
    state: Dict[str, np.ndarray] = {}
    state["item_sid_embedding_table.weight"] = np.asarray(p["sid_embedding"]).copy()
    state["bos_token"] = np.asarray(p["bos_token"]).copy()
    if "sep_token" in p:
        state["sep_token"] = np.asarray(p["sep_token"]).copy()
    if "user_embedding" in p:
        state["user_embedding.weight"] = np.asarray(p["user_embedding"]).copy()
    heads = np.asarray(p["heads"])  # [L, d, K]
    for h in range(cfgl):
        state[f"decoder_mlp.{h}.weight"] = heads[h].T.copy()
    state.update(_t5_stack_state(p["encoder"], cfg.t5_num_layers, False, "encoder.encoder."))
    state.update(_t5_stack_state(p["decoder"], cfg.t5_num_layers, True, "t5_decoder."))
    return state


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Export an RQ-VAE checkpoint to reference .pt")
    ap.add_argument("src", help="our checkpoint .msgpack path")
    ap.add_argument("dst", help="output .pt path")
    args = ap.parse_args()
    print(export_checkpoint(args.src, args.dst))


if __name__ == "__main__":
    main()
