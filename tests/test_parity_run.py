"""The one-command real-data parity chain, executed offline.

Drives `parity_run.py` ITSELF (the CLI, in a subprocess — not the pieces)
over miniature RAW-format fixtures: raw files -> pipeline npz -> stage-1
RQ-VAE -> stage-2 decoder -> full retrieval eval -> metrics JSON. This is
the composition the reference runs on real downloads
(/root/reference/train_decoder.py:84-246); proving it executable offline
means a networked host running `parity_run.py --dataset amazon` tests only
bandwidth, not code.

Budgets are clamped via the CLI's --set overrides; the text encoder falls
back to hashed features (HF_HUB_OFFLINE short-circuits the sentence-T5
lookup). ~4 min total on CPU — the ml32m leg compiles the real 200-item
(~800-token) flagship geometry.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from rawfixtures import write_amazon_raw, write_ml1m_raw, write_ml32m_raw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_parity(tmp_path, dataset, writer, extra_sets):
    work = str(tmp_path / "data")
    outdir = str(tmp_path / "out")
    out_json = str(tmp_path / "parity.json")
    writer(work)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["HF_HUB_OFFLINE"] = "1"  # fail the sentence-T5 lookup fast -> hash fallback
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never register the TPU plugin
    cmd = [
        sys.executable, os.path.join(REPO, "parity_run.py"),
        "--dataset", dataset, "--quick",
        "--workdir", work, "--outdir", outdir, "--out", out_json,
    ]
    for s in extra_sets:
        cmd += ["--set", s]
    # generous cap: the chain takes ~2-4 min alone but shares one core with
    # whatever else runs on a loaded box (observed >560 s under 3-way load)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    with open(out_json) as f:
        result = json.load(f)
    # the chain really ran: raw was processed and both stages trained
    assert os.path.exists(os.path.join(work, "processed", "data.npz"))
    assert result["stage1"]["checkpoint_path"]
    assert result["stage2"]["checkpoint_path"]
    metrics = result["metrics"]
    assert set(metrics) >= {"h@1", "h@5", "h@10", "ndcg"}
    for k, v in metrics.items():
        assert np.isfinite(v) and 0.0 <= v <= 1.0, (k, v)
    return result


@pytest.mark.e2e
def test_amazon_p5_raw_to_metrics(tmp_path):
    res = _run_parity(
        tmp_path, "amazon", write_amazon_raw,
        ["s1.iterations=12", "s2.iterations=6", "both.batch_size=32"],
    )
    assert res["stage1_config"].endswith("rqvae_amazon.gin")


@pytest.mark.e2e
def test_ml1m_dat_raw_to_metrics(tmp_path):
    # third raw format (::-delimited .dat) + the user-demographics path
    res = _run_parity(
        tmp_path, "ml1m", write_ml1m_raw,
        ["s1.iterations=12", "s2.iterations=4", "both.batch_size=8"],
    )
    assert res["stage2_config"].endswith("decoder_ml1m.gin")


@pytest.mark.e2e
def test_ml32m_csv_raw_to_metrics(tmp_path):
    # flagship long-sequence geometry (200-item windows -> ~800 tokens)
    res = _run_parity(
        tmp_path, "ml32m", write_ml32m_raw,
        ["s1.iterations=12", "s2.iterations=4", "both.batch_size=8"],
    )
    assert res["stage2_config"].endswith("decoder_ml32m.gin")
