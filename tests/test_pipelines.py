"""Real-dataset pipeline tests on miniature fake raw files (hermetic: the
hash text encoder stands in for sentence-T5)."""

import numpy as np
import pytest
from rawfixtures import write_amazon_raw, write_ml1m_raw, write_ml32m_raw

from rqvae_tpu.data.amazon import process_amazon
from rqvae_tpu.data.datasets import ItemDataset, SeqDataset, load_processed
from rqvae_tpu.data.ml1m import process_ml1m
from rqvae_tpu.data.ml32m import process_ml32m
from rqvae_tpu.data.preprocessing import (
    generate_user_history_windows,
    hashed_text_features,
    ordered_train_split,
    remove_low_occurrence_ids,
)


class TestPreprocessingOps:
    def test_low_occurrence_filter(self):
        ids = np.array([1, 1, 1, 1, 1, 2, 2, 3])
        mask = remove_low_occurrence_ids(ids, 5)
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0, 0, 0])

    def test_hashed_features_deterministic_and_normalized(self):
        a = hashed_text_features(["hello world", "foo"], dim=64)
        b = hashed_text_features(["hello world", "foo"], dim=64)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
        # lexical overlap -> similarity
        sim_same = hashed_text_features(["red shoe", "red shoe x"], dim=256)
        assert (sim_same[0] * sim_same[1]).sum() > 0.5

    def test_ordered_split(self):
        ts = np.arange(100)
        m = ordered_train_split(ts, 0.8)
        assert m[:80].all() and not m[81:].any()

    def test_window_generation(self):
        users = np.array([1, 1, 1, 1, 1, 2, 2, 2])
        items = np.array([10, 11, 12, 13, 14, 20, 21, 22])
        ts = np.arange(8)
        out = generate_user_history_windows(users, items, ts, window_size=3, stride=2)
        # user 1: windows [10,11,12],[12,13,14],[14]; user 2: [20,21,22],[22]
        assert out["seq_items"].shape[1] == 3
        got = {tuple(r[r >= 0]) for r in out["seq_items"]}
        expect_all = {(10, 11, 12), (12, 13, 14), (14,), (20, 21, 22), (22,)}
        # eval windows of length 1 may be dropped; train ones kept
        assert got <= expect_all
        assert (10, 11, 12) in got and (20, 21, 22) in got
        # ordering within each window preserved (time-sorted)
        assert out["seq_is_train"].dtype == bool


@pytest.fixture
def amazon_root(tmp_path):
    # 6 users, 8 items (1-based in raw files)
    return write_amazon_raw(str(tmp_path))


class TestAmazonPipeline:
    def test_end_to_end(self, amazon_root):
        path = process_amazon(amazon_root, split="beauty", encoder="hash")
        data = load_processed(amazon_root)
        assert data["item_features"].shape == (8, 768)
        assert data["seq_items"].shape[0] == 6
        # 1-based raw -> 0-based ids
        np.testing.assert_array_equal(data["seq_items"][0][:6], [0, 1, 2, 3, 4, 5])
        assert str(data["seq_format"]) == "leave_two_out"
        assert int(data["max_seq_len"]) == 20

        # dataset views work on it
        items = ItemDataset(data, "all")
        assert len(items) == 8
        seqs = SeqDataset(data, split="eval")
        b = seqs.batch(np.arange(3))
        # eval target is items[-2] of each sequence
        assert b.ids_fut[0] == 4  # seq 0: [0..5], items[-2]=4

    def test_missing_raw_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="download=False"):
            process_amazon(str(tmp_path), split="beauty", download=False)


@pytest.fixture
def ml1m_root(tmp_path):
    return write_ml1m_raw(str(tmp_path))


class TestML1MPipeline:
    def test_end_to_end(self, ml1m_root):
        process_ml1m(ml1m_root, encoder="hash", max_seq_len=5, stride=2)
        data = load_processed(ml1m_root)
        assert data["item_features"].shape[1] == 768 + 18  # emb + genre one-hots
        assert str(data["seq_format"]) == "windows"
        # genre one-hots present (Comedy and Drama for every movie)
        assert data["item_features"][:, 768:].sum(1).min() == 2

        tr = SeqDataset(data, split="train", subsample=True)
        ev = SeqDataset(data, split="test")
        assert len(tr) > 0 and len(ev) > 0
        b = tr.sample_batch(np.random.RandomState(0), 8)
        assert b.ids.shape == (8, 5)
        be = ev.batch(np.arange(min(4, len(ev))))
        assert (be.ids_fut >= 0).all()

    def test_user_demographics(self, ml1m_root):
        # reference ml1m.py:59-82: [age_dummies.argmax, gender first dummy
        # col (F before M lexicographically), occupation str-dummies argmax]
        process_ml1m(ml1m_root, encoder="hash", max_seq_len=5, stride=2)
        data = load_processed(ml1m_root)
        uf = data["user_features"]
        uids = data["user_feature_ids"]
        assert uf.shape == (6, 3)
        np.testing.assert_array_equal(uids, np.arange(1, 7))
        # ages "1","18","25","35","45","50" sort lexicographically in the
        # written order -> age index == user index
        np.testing.assert_array_equal(uf[:, 0], np.arange(6))
        # gender: first dummy column is "F" (users 1,3,5 -> rows 0,2,4)
        np.testing.assert_array_equal(uf[:, 1], [1, 0, 1, 0, 1, 0])
        # occupations "0","10","2","15","4","20" sorted lexicographically:
        # 0,10,15,2,20,4 -> indices written order [0,1,3,2,5,4]
        np.testing.assert_array_equal(uf[:, 2], [0, 1, 3, 2, 5, 4])


@pytest.fixture
def ml32m_root(tmp_path):
    return write_ml32m_raw(str(tmp_path))


class TestML32MPipeline:
    def test_end_to_end(self, ml32m_root):
        process_ml32m(ml32m_root, encoder="hash", window_size=5, stride=4)
        data = load_processed(ml32m_root)
        assert data["item_features"].shape[1] == 768 + 20
        assert str(data["seq_format"]) == "windows"
        tr = SeqDataset(data, split="train")
        assert len(tr) > 0
        # windows format: target = last item of the window
        b = tr.batch(np.arange(2))
        assert (b.ids_fut >= 0).all()
