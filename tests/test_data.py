"""Data layer tests: synthetic generator, dataset windowing semantics
(leave-two-out + random subsampling per reference data/processed.py), and
fixed-shape batch invariants."""

import numpy as np
import pytest

from rqvae_tpu.data.datasets import ItemDataset, SeqDataset, load_processed
from rqvae_tpu.data.synthetic import SyntheticConfig, generate, generate_and_save


@pytest.fixture(scope="module")
def data():
    return generate(SyntheticConfig(n_items=300, n_users=80, input_dim=16, max_seq_len=10, seed=3))


class TestSynthetic:
    def test_layout(self, data):
        assert data["item_features"].shape == (300, 16)
        assert data["item_features"].dtype == np.float32
        assert data["seq_items"].shape == (80, 12)  # max_seq_len + 2
        assert (data["seq_lengths"] >= 8).all()
        # right-padding with -1 beyond the length
        for u in range(80):
            L = data["seq_lengths"][u]
            assert (data["seq_items"][u, :L] >= 0).all()
            assert (data["seq_items"][u, L:] == -1).all()

    def test_determinism(self):
        cfg = SyntheticConfig(n_items=50, n_users=10, input_dim=8, seed=7)
        a, b = generate(cfg), generate(cfg)
        np.testing.assert_array_equal(a["item_features"], b["item_features"])
        np.testing.assert_array_equal(a["seq_items"], b["seq_items"])

    def test_save_roundtrip(self, tmp_path):
        cfg = SyntheticConfig(n_items=50, n_users=10, input_dim=8)
        generate_and_save(str(tmp_path), cfg)
        loaded = load_processed(str(tmp_path))
        np.testing.assert_array_equal(loaded["item_features"], generate(cfg)["item_features"])

    def test_item_split_is_95_5ish(self, data):
        frac = data["item_is_train"].mean()
        assert 0.9 < frac < 1.0


class TestItemDataset:
    def test_splits_partition_corpus(self, data):
        all_ds = ItemDataset(data, "all")
        tr = ItemDataset(data, "train")
        ev = ItemDataset(data, "eval")
        assert len(tr) + len(ev) == len(all_ds) == 300
        assert set(tr.corpus_ids) | set(ev.corpus_ids) == set(range(300))

    def test_sample_batch_shape(self, data):
        ds = ItemDataset(data, "train")
        x = ds.sample_batch(np.random.RandomState(0), 32)
        assert x.shape == (32, 16) and x.dtype == np.float32


class TestSeqDataset:
    def test_eval_window_semantics(self, data):
        ds = SeqDataset(data, split="eval")
        b = ds.batch(np.arange(5))
        for i in range(5):
            L = data["seq_lengths"][i]
            full = data["seq_items"][i]
            # target is items[L-2]; history is the max_seq_len items before it
            assert b.ids_fut[i] == full[L - 2]
            n_hist = min(ds.max_seq_len, L - 2)
            np.testing.assert_array_equal(b.ids[i, :n_hist], full[L - 2 - n_hist : L - 2])
            assert (b.ids[i, n_hist:] == -1).all()

    def test_test_window_semantics(self, data):
        ds = SeqDataset(data, split="test")
        b = ds.batch(np.arange(5))
        for i in range(5):
            L = data["seq_lengths"][i]
            assert b.ids_fut[i] == data["seq_items"][i][L - 1]

    def test_subsample_contiguity_and_target(self, data):
        ds = SeqDataset(data, split="train", subsample=True)
        rng = np.random.RandomState(0)
        b = ds.sample_batch(rng, 64)
        assert b.ids.shape == (64, ds.max_seq_len)
        for i in range(64):
            ids = b.ids[i]
            n = int((ids >= 0).sum())
            # history is a contiguous run then -1 padding
            assert (ids[:n] >= 0).all() and (ids[n:] == -1).all()
            # (history + target) is a contiguous window of the user's sequence
            uidx = np.where(data["user_ids"] == b.user_ids[i])[0][0]
            full = data["seq_items"][uidx]
            window = np.concatenate([ids[:n], [b.ids_fut[i]]])
            found = any(
                np.array_equal(full[s : s + n + 1], window)
                for s in range(0, data["seq_lengths"][uidx])
            )
            assert found

    def test_subsample_never_uses_test_target(self, data):
        # the last item (test target) must never appear in train windows
        ds = SeqDataset(data, split="train", subsample=True)
        rng = np.random.RandomState(1)
        for _ in range(20):
            b = ds.sample_batch(rng, 32)
            for i in range(32):
                uidx = np.where(data["user_ids"] == b.user_ids[i])[0][0]
                L = data["seq_lengths"][uidx]
                test_pos = L - 1
                window = np.concatenate([b.ids[i][b.ids[i] >= 0], [b.ids_fut[i]]])
                # window ends at most at position L-2 of the full sequence
                assert len(window) <= test_pos + 1 - 0
                # target index in the full sequence is <= L-2
                # (window is full[s:s+n+1] with s+n <= L-2)
                assert (window == data["seq_items"][uidx][test_pos]).sum() <= (
                    (data["seq_items"][uidx][: test_pos] == data["seq_items"][uidx][test_pos]).sum() + 0
                )

    def test_feature_gather_masks_padding(self, data):
        ds = SeqDataset(data, split="eval")
        b = ds.batch(np.arange(8))
        pad = b.ids == -1
        assert (b.x[pad] == -1.0).all()
        real = ~pad
        i, j = np.nonzero(real)
        np.testing.assert_array_equal(b.x[i[0], j[0]], ds.features[b.ids[i[0], j[0]]])

    def test_eval_iteration_covers_all(self, data):
        ds = SeqDataset(data, split="eval")
        seen = 0
        for batch, valid in ds.iter_eval_batches(32):
            assert batch.ids.shape[0] == 32
            seen += valid
        assert seen == len(ds)


class TestWindowsFormatShortRows:
    def _data(self):
        # windows-format dataset with a length-1 eval row and a length-3 row
        return {
            "seq_format": "windows",
            "seq_items": np.array([[7, -1, -1], [2, 5, 9], [4, -1, -1]], np.int64),
            "seq_lengths": np.array([1, 3, 1], np.int64),
            "seq_is_train": np.array([False, False, True]),
            "user_ids": np.array([0, 1, 2], np.int64),
            "item_features": np.zeros((10, 4), np.float32),
            "max_seq_len": 3,
        }

    def test_length_one_window_targets_its_only_item(self):
        # regression: hist_end clamped to 1 used to index PADDING (-1),
        # which the tokenizer then mapped to item 0's semantic ids
        ds = SeqDataset(self._data(), split="eval")
        b = ds.batch(np.arange(2))
        assert b.ids_fut[0] == 7  # the row's only item, not -1
        assert (b.ids[0] == -1).all()  # empty history
        assert b.ids_fut[1] == 9
        np.testing.assert_array_equal(b.ids[1, :2], [2, 5])

    def test_jit_eval_windows_matches(self):
        import jax.numpy as jnp
        from rqvae_tpu.data.jax_sampling import eval_windows

        d = self._data()
        L = d["seq_lengths"]
        hist_end = np.maximum(L - 1, 0)
        hist, fut = eval_windows(
            jnp.asarray(d["seq_items"]), jnp.asarray(L), jnp.arange(3), jnp.asarray(hist_end), 3
        )
        np.testing.assert_array_equal(np.asarray(fut), [7, 9, 4])
        assert (np.asarray(hist)[0] == -1).all()


class TestRegistryStamp:
    def test_mismatched_dataset_at_same_root_is_refused(self, tmp_path):
        import pytest as _pytest
        from rqvae_tpu.data.registry import RecDataset, ensure_dataset

        root = str(tmp_path / "ds")
        d = ensure_dataset(root, RecDataset.SYNTHETIC)  # generates + stamps
        assert str(d["dataset_name"]) == "synthetic"
        # same root, different dataset: must refuse, not silently reuse
        with _pytest.raises(ValueError, match="synthetic"):
            ensure_dataset(root, RecDataset.AMAZON, split="beauty")
