"""On-device sampling semantics match the numpy SeqDataset path."""

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.datasets import SeqDataset
from rqvae_tpu.data.jax_sampling import eval_windows, subsample_windows
from rqvae_tpu.data.synthetic import SyntheticConfig, generate


def _data():
    return generate(SyntheticConfig(n_items=200, n_users=50, input_dim=8, max_seq_len=10, seed=11))


class TestSubsampleWindows:
    def test_window_invariants(self):
        data = _data()
        seq = jnp.asarray(data["seq_items"])
        lens = jnp.asarray(data["seq_lengths"])
        ml = int(data["max_seq_len"])
        for s in range(5):
            idx = jnp.asarray(np.random.RandomState(s).randint(0, 50, 32))
            hist, fut = subsample_windows(jax.random.PRNGKey(s), seq, lens, idx, ml)
            hist, fut = np.asarray(hist), np.asarray(fut)
            assert hist.shape == (32, ml)
            for b in range(32):
                n = int((hist[b] >= 0).sum())
                # contiguous run then padding
                assert (hist[b][:n] >= 0).all() and (hist[b][n:] == -1).all()
                # (history + target) is a contiguous window of the user's
                # sequence restricted to items[:L-1] (leave-two-out)
                u = int(idx[b])
                L = int(lens[u])
                full = data["seq_items"][u][: L - 1]
                window = np.concatenate([hist[b][:n], [fut[b]]])
                assert len(window) >= min(3, L - 1)
                assert len(window) <= ml + 1
                found = any(
                    np.array_equal(full[s0 : s0 + len(window)], window)
                    for s0 in range(max(1, len(full)))
                )
                assert found
                # test target (items[L-1]) position never included
                # (window confined to full=items[:L-1] by construction)

    def test_matches_numpy_distribution(self):
        # same start/end distribution family as the numpy path: check
        # window-length histograms roughly agree over many draws
        data = _data()
        seq = jnp.asarray(data["seq_items"])
        lens = jnp.asarray(data["seq_lengths"])
        ml = int(data["max_seq_len"])
        ds = SeqDataset(data, split="train", subsample=True)
        rng = np.random.RandomState(0)

        np_lens, jax_lens = [], []
        for s in range(30):
            b = ds.sample_batch(rng, 64)
            np_lens.extend(((b.ids >= 0).sum(1) + 1).tolist())
            idx = jnp.asarray(np.random.RandomState(1000 + s).randint(0, 50, 64))
            hist, fut = subsample_windows(jax.random.PRNGKey(s), seq, lens, idx, ml)
            jax_lens.extend((np.asarray((hist >= 0).sum(1)) + 1).tolist())
        assert abs(np.mean(np_lens) - np.mean(jax_lens)) < 0.5


class TestEvalWindows:
    def test_matches_numpy_eval_batch(self):
        data = _data()
        ds = SeqDataset(data, split="eval")
        idx = np.arange(10)
        b = ds.batch(idx)
        lens = jnp.asarray(data["seq_lengths"])
        hist_end = jnp.maximum(lens[jnp.asarray(idx)] - 2, 1)
        hist, fut = eval_windows(
            jnp.asarray(data["seq_items"]), lens, jnp.asarray(idx), hist_end, ds.max_seq_len
        )
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(fut), np.asarray(b.ids_fut))
