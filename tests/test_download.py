"""Downloader tests (hermetic: file:// URLs, no network)."""

import os
import zipfile

import numpy as np
import pytest

from rqvae_tpu.data.download import DownloadError, download_url, extract_zip, fetch_zip_members


class TestDownload:
    def test_download_url_file_scheme(self, tmp_path):
        src = tmp_path / "payload.bin"
        data = np.random.RandomState(0).bytes(1 << 16)
        src.write_bytes(data)
        dest = tmp_path / "out" / "payload.bin"
        download_url(f"file://{src}", str(dest))
        assert dest.read_bytes() == data
        assert not os.path.exists(str(dest) + ".part")

    def test_download_url_failure_raises_and_cleans_up(self, tmp_path):
        dest = tmp_path / "nope.bin"
        with pytest.raises(DownloadError):
            download_url(f"file://{tmp_path}/does_not_exist", str(dest))
        assert not dest.exists()
        assert not os.path.exists(str(dest) + ".part")

    def test_fetch_zip_members_moves_inner_dir(self, tmp_path):
        # archive layout mirrors the P5 zip: data/<split>/<files>
        zsrc = tmp_path / "archive.zip"
        with zipfile.ZipFile(zsrc, "w") as z:
            z.writestr("data/beauty/sequential_data.txt", "1 2 3\n")
            z.writestr("data/sports/sequential_data.txt", "4 5 6\n")
        raw = tmp_path / "raw"
        fetch_zip_members(f"file://{zsrc}", str(raw), "data", archive_name="P5_data.zip")
        assert (raw / "beauty" / "sequential_data.txt").read_text() == "1 2 3\n"
        assert (raw / "sports" / "sequential_data.txt").read_text() == "4 5 6\n"
        assert not (raw / "P5_data.zip").exists()
        assert not (raw / "_extract_tmp").exists()

    def test_extract_zip(self, tmp_path):
        zsrc = tmp_path / "a.zip"
        with zipfile.ZipFile(zsrc, "w") as z:
            z.writestr("x/y.txt", "hello")
        extract_zip(str(zsrc), str(tmp_path / "dest"))
        assert (tmp_path / "dest" / "x" / "y.txt").read_text() == "hello"
