"""Torch checkpoint import bridge: build a reference-layout state_dict with
torch, convert, and check numerical equivalence of the forward pass."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
from rqvae_tpu.utils.torch_import import (
    load_reference_rqvae_checkpoint,
    rqvae_params_from_torch_state,
)

CFG = RqVaeConfig(
    input_dim=24,
    embed_dim=8,
    hidden_dims=(16, 12),
    codebook_size=16,
    n_layers=3,
    n_cat_feats=0,
    codebook_mode=QuantizeForwardMode.STE,
)


def _reference_layout_state_dict(cfg):
    """Construct tensors in the reference's state_dict layout (encoder.mlp
    Sequential with interleaved ReLUs, per-layer embedding weights)."""
    g = torch.Generator().manual_seed(0)
    sd = {}
    dims = [cfg.input_dim] + list(cfg.hidden_dims) + [cfg.embed_dim]
    seq_idx = 0
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f"encoder.mlp.{seq_idx}.weight"] = torch.randn(b, a, generator=g)
        seq_idx += 1
        if i != len(dims) - 2:
            seq_idx += 1  # ReLU occupies an index in nn.Sequential
    rdims = [cfg.embed_dim] + list(reversed(cfg.hidden_dims)) + [cfg.input_dim]
    seq_idx = 0
    for i, (a, b) in enumerate(zip(rdims[:-1], rdims[1:])):
        sd[f"decoder.mlp.{seq_idx}.weight"] = torch.randn(b, a, generator=g)
        seq_idx += 1
        if i != len(rdims) - 2:
            seq_idx += 1
    for l in range(cfg.n_layers):
        sd[f"layers.{l}.embedding.weight"] = torch.rand(cfg.codebook_size, cfg.embed_dim, generator=g)
    return sd


def _torch_forward_ids(sd, cfg, x):
    """Reference-math forward (eval path) in torch: encode -> L x argmin."""
    h = torch.from_numpy(x)
    dims = [cfg.input_dim] + list(cfg.hidden_dims) + [cfg.embed_dim]
    seq_idx = 0
    for i in range(len(dims) - 1):
        h = h @ sd[f"encoder.mlp.{seq_idx}.weight"].T
        seq_idx += 1
        if i != len(dims) - 2:
            h = torch.relu(h)
            seq_idx += 1
    ids = []
    for l in range(cfg.n_layers):
        cb = sd[f"layers.{l}.embedding.weight"]
        d = (h**2).sum(1, keepdim=True) + (cb**2).sum(1)[None, :] - 2 * h @ cb.T
        i = d.argmin(1)
        ids.append(i)
        h = h - cb[i]
    return torch.stack(ids, 1).numpy()


class TestTorchImport:
    def test_forward_equivalence(self):
        sd = _reference_layout_state_dict(CFG)
        params = rqvae_params_from_torch_state(sd, CFG.n_layers)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        model = RqVae(CFG)
        x = np.random.RandomState(0).randn(32, CFG.input_dim).astype(np.float32)
        ours = np.asarray(
            model.apply(params, jnp.asarray(x), training=False, method=RqVae.get_semantic_ids).sem_ids
        )
        torch_ids = _torch_forward_ids(sd, CFG, x)
        match = (ours == torch_ids).all(1).mean()
        assert match >= 0.999, f"id agreement {match}"

    def test_full_checkpoint_roundtrip(self, tmp_path):
        sd = _reference_layout_state_dict(CFG)
        ckpt = {
            "iter": 1234,
            "model": {("_orig_mod." + k): v for k, v in sd.items()},  # compiled-model prefix
            "model_config": {
                "input_dim": CFG.input_dim,
                "embed_dim": CFG.embed_dim,
                "hidden_dims": list(CFG.hidden_dims),
                "codebook_size": CFG.codebook_size,
                "n_layers": CFG.n_layers,
                "commitment_weight": 0.25,
                "n_cat_features": 0,
                "codebook_normalize": False,
                "codebook_sim_vq": False,
            },
            "optimizer": {},
        }
        pt = tmp_path / "checkpoint_1234.pt"
        torch.save(ckpt, pt)
        cfg, params, step = load_reference_rqvae_checkpoint(str(pt))
        assert step == 1234
        assert cfg.embed_dim == CFG.embed_dim
        assert params["params"]["codebooks"].shape == (3, 16, 8)

        # convert to our format and load through the normal path
        from rqvae_tpu.utils.torch_import import convert_reference_checkpoint
        from rqvae_tpu.utils.checkpoint import load_checkpoint

        out = convert_reference_checkpoint(str(pt), str(tmp_path / "out"))
        restored = load_checkpoint(out)
        assert restored["step"] == 1234
        assert restored["config"].codebook_size == 16
