"""Profiling and debug utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.utils.debug import assert_finite, debug_enabled
from rqvae_tpu.utils.profiling import timeit


class TestProfiling:
    def test_timeit_separates_compile(self):
        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        x = jnp.ones((64, 64))
        stats = timeit(f, x, runs=5)
        assert stats["first_call_s"] > 0
        assert stats["steady_state_s"] > 0
        assert stats["first_call_s"] >= stats["steady_state_s"]
        assert stats["calls_per_sec"] > 0


class TestDebug:
    def test_assert_finite_passes_on_clean_tree(self):
        assert_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}, "test")

    def test_assert_finite_raises_on_nan(self):
        with pytest.raises(FloatingPointError, match="bad"):
            assert_finite({"bad": jnp.array([1.0, np.nan])}, "ctx")

    def test_debug_env_flag(self, monkeypatch):
        monkeypatch.setenv("RQVAE_TPU_DEBUG", "0")
        assert not debug_enabled()
        monkeypatch.setenv("RQVAE_TPU_DEBUG", "1")
        assert debug_enabled()
