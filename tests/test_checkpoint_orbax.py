"""Orbax checkpoint backend round-trip."""

import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.rqvae import RqVaeConfig
from rqvae_tpu.train.state import TrainState, adamw
from rqvae_tpu.utils.checkpoint_orbax import load_checkpoint_orbax, save_checkpoint_orbax


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path):
        params = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
        tx = adamw(1e-3)
        state = TrainState.create(params, tx)
        cfg = RqVaeConfig(input_dim=9)
        path = save_checkpoint_orbax(str(tmp_path), 17, state.params, state.opt_state, cfg)
        restored = load_checkpoint_orbax(
            path, params_template=params, opt_state_template=state.opt_state
        )
        assert restored["step"] == 17
        assert restored["config"].input_dim == 9
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["params"]["w"]), np.arange(6.0).reshape(2, 3)
        )
