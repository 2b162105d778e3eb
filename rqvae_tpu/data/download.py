"""Dataset downloaders (stdlib-only: urllib + zipfile).

Reference parity: the reference downloads raw archives on first use —
the P5 Amazon zip from Google Drive (/root/reference/data/amazon.py:54-60
via torch_geometric's download_google_url) and the MovieLens zips from
grouplens (/root/reference/data/ml32m.py:40-42, ml1m via
torch_geometric.datasets.MovieLens1M). These helpers reproduce that
one-command behavior without torch_geometric; every caller degrades to a
clear offline message when the network is unavailable (zero-egress hosts).
"""

from __future__ import annotations

import os
import shutil
import sys
import zipfile


class DownloadError(RuntimeError):
    pass


def _urlopen(url: str, timeout: float = 60.0):
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
    return urllib.request.urlopen(req, timeout=timeout)


def download_url(url: str, dest_path: str, timeout: float = 60.0) -> str:
    """Stream url -> dest_path. Raises DownloadError on any failure."""
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    tmp = dest_path + ".part"
    try:
        with _urlopen(url, timeout) as r, open(tmp, "wb") as f:
            total = int(r.headers.get("Content-Length") or 0)
            done = 0
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if total:
                    print(f"\r  {dest_path}: {done / 1e6:.0f}/{total / 1e6:.0f} MB",
                          end="", file=sys.stderr)
        print(file=sys.stderr)
        os.replace(tmp, dest_path)
        return dest_path
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise DownloadError(f"download of {url} failed: {e}") from e


def download_google_drive(file_id: str, dest_path: str, timeout: float = 60.0) -> str:
    """Download a (large) public Google Drive file, following the
    confirm-token redirect for virus-scan interstitials — the stdlib
    equivalent of torch_geometric's download_google_url (used by the
    reference at data/amazon.py:54)."""
    import html as html_mod
    import re
    import urllib.parse

    url = f"https://drive.usercontent.google.com/download?id={file_id}&export=download"
    os.makedirs(os.path.dirname(dest_path), exist_ok=True)
    tmp = dest_path + ".part"
    try:
        with _urlopen(url, timeout) as r:
            ctype = r.headers.get("Content-Type", "")
            if "text/html" not in ctype:
                # direct stream: keep reading THIS response (no second
                # request re-transferring the head)
                with open(tmp, "wb") as f:
                    shutil.copyfileobj(r, f, 1 << 20)
                os.replace(tmp, dest_path)
                return dest_path
            head = r.read(1 << 20)
        # interstitial page: extract + properly encode the confirm form
        # parameters (values may contain &, =, +)
        page = head.decode("utf-8", "replace")
        params = {
            k: html_mod.unescape(v)
            for k, v in re.findall(r'name="(\w+)" value="([^"]*)"', page)
        }
        if "confirm" not in params and "uuid" not in params:
            raise DownloadError(
                f"Google Drive file {file_id}: no direct download and no "
                "confirm token (quota exceeded or permission issue)"
            )
        qs = urllib.parse.urlencode(params)
        return download_url(
            f"https://drive.usercontent.google.com/download?{qs}", dest_path, timeout
        )
    except DownloadError:
        raise
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise DownloadError(f"download of gdrive {file_id} failed: {e}") from e


def extract_zip(zip_path: str, dest_dir: str) -> None:
    os.makedirs(dest_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(dest_dir)


def fetch_zip_members(url_or_gdrive: str, raw_dir: str, inner_dir: str,
                      gdrive: bool = False, archive_name: str = "archive.zip") -> None:
    """Download an archive and move `inner_dir`'s contents into raw_dir
    (the reference's download()+extract+rename dance, amazon.py:54-60)."""
    os.makedirs(raw_dir, exist_ok=True)
    zpath = os.path.join(raw_dir, archive_name)
    if gdrive:
        download_google_drive(url_or_gdrive, zpath)
    else:
        download_url(url_or_gdrive, zpath)
    tmp = os.path.join(raw_dir, "_extract_tmp")
    extract_zip(zpath, tmp)
    src = os.path.join(tmp, inner_dir) if inner_dir else tmp
    for name in os.listdir(src):
        dst = os.path.join(raw_dir, name)
        if os.path.exists(dst):
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            else:
                os.remove(dst)
        shutil.move(os.path.join(src, name), dst)
    shutil.rmtree(tmp, ignore_errors=True)
    os.remove(zpath)
