"""Torch checkpoint EXPORT bridge (utils/torch_export.py): our params ->
reference-layout .pt, the inverse of torch_import. Round-trip through the
importer must be exact, and key names must match the reference's
nn.Sequential layout (Linear at even indices; reference encoder.py:25-32)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.rqvae import RqVae, RqVaeConfig
from rqvae_tpu.utils.torch_export import (
    export_checkpoint,
    save_reference_checkpoint,
    torch_state_from_rqvae_params,
)
from rqvae_tpu.utils.torch_import import (
    load_reference_rqvae_checkpoint,
    rqvae_params_from_torch_state,
)

CFG = RqVaeConfig(
    input_dim=24, embed_dim=8, hidden_dims=(16, 12), codebook_size=16,
    n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.STE,
)


def _init_params(cfg=CFG, sim_vq=False):
    if sim_vq:
        cfg = RqVaeConfig(**{**cfg.__dict__, "sim_vq": True})
    model = RqVae(cfg)
    x = np.random.RandomState(0).randn(4, cfg.input_dim).astype(np.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, 0.2, training=True,
    )
    return cfg, params


class TestTorchExport:
    def test_key_layout_matches_reference_sequential(self):
        _, params = _init_params()
        state = torch_state_from_rqvae_params(params, CFG.n_layers)
        # 3 Linears (2 hidden + out) at nn.Sequential indices 0, 2, 4
        for side in ("encoder", "decoder"):
            assert {k for k in state if k.startswith(side)} == {
                f"{side}.mlp.0.weight", f"{side}.mlp.2.weight", f"{side}.mlp.4.weight"
            }
        # torch Linear convention [out, in]
        assert state["encoder.mlp.0.weight"].shape == (16, 24)
        assert state["decoder.mlp.4.weight"].shape == (24, 16)
        for l in range(CFG.n_layers):
            assert state[f"layers.{l}.embedding.weight"].shape == (16, 8)

    def test_roundtrip_import_is_exact(self):
        _, params = _init_params()
        state = torch_state_from_rqvae_params(params, CFG.n_layers)
        back = rqvae_params_from_torch_state(state, CFG.n_layers)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, a in flat_a:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(flat_b[path]))

    def test_simvq_out_proj_roundtrip(self):
        cfg, params = _init_params(sim_vq=True)
        state = torch_state_from_rqvae_params(params, cfg.n_layers)
        assert "layers.0.out_proj.0.weight" in state
        back = rqvae_params_from_torch_state(state, cfg.n_layers)
        np.testing.assert_array_equal(
            np.asarray(back["params"]["out_proj"]), np.asarray(params["params"]["out_proj"])
        )

    def test_pt_file_roundtrip_with_config(self, tmp_path):
        cfg, params = _init_params()
        pt = str(tmp_path / "exported.pt")
        save_reference_checkpoint(cfg, params, step=123, dst=pt)
        # the importer (which also handles real reference files) reads it back
        cfg2, params2, step = load_reference_rqvae_checkpoint(pt)
        assert step == 123
        assert cfg2 == cfg
        np.testing.assert_array_equal(
            np.asarray(params2["params"]["codebooks"]),
            np.asarray(params["params"]["codebooks"]),
        )
        # plain-Python pickle only (portable to the reference environment)
        raw = torch.load(pt, map_location="cpu", weights_only=False)
        assert raw["model_config"]["codebook_mode"] == "STE"
        assert all(isinstance(v, torch.Tensor) for v in raw["model"].values())

    def test_cli_export_from_msgpack(self, tmp_path):
        from rqvae_tpu.utils.checkpoint import save_checkpoint

        cfg, params = _init_params()
        src = save_checkpoint(str(tmp_path), 7, params, None, cfg)
        dst = str(tmp_path / "out.pt")
        export_checkpoint(src, dst)
        cfg2, params2, step = load_reference_rqvae_checkpoint(dst)
        assert step == 7 and cfg2 == cfg
