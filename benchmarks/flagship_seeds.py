"""Flagship-scale synthetic end-to-end quality, multi-seed (VERDICT r4
Next #5: the h@10=0.54 flagship row was a single seed).

Runs the exact shipped configs (configs/rqvae_synthetic_big.gin ->
configs/decoder_synthetic_big.gin) per seed — only `seed` and the output
dirs vary — and reports per-seed retrieval metrics + mean/sd.

Usage: PYTHONPATH=/root/repo python benchmarks/flagship_seeds.py \
    [--seeds 0,1,2] [--out out/r5/flagship_seeds.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    argv = sys.argv[1:]
    seeds = [0, 1, 2]
    out_path = None
    if "--seeds" in argv:
        seeds = [int(s) for s in argv[argv.index("--seeds") + 1].split(",")]
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    from rqvae_tpu.train.train_decoder import train as train_decoder
    from rqvae_tpu.train.train_rqvae import train as train_rqvae
    from rqvae_tpu.utils.config import parse_config_file

    s1_cfg = parse_config_file("configs/rqvae_synthetic_big.gin")
    s2_cfg = parse_config_file("configs/decoder_synthetic_big.gin")

    rows = []
    for seed in seeds:
        t0 = time.perf_counter()
        c1 = dict(s1_cfg)
        c1.update(seed=seed, save_dir_root=f"out/r5/flagship/rq{seed}/")
        s1 = train_rqvae(**c1)
        c2 = dict(s2_cfg)
        c2.update(
            seed=seed,
            save_dir_root=f"out/r5/flagship/dec{seed}/",
            pretrained_rqvae_path=s1["checkpoint_path"],
        )
        s2 = train_decoder(**c2)
        row = {
            "seed": seed,
            "h@1": s2["h@1"], "h@5": s2["h@5"], "h@10": s2["h@10"],
            "ndcg": s2["ndcg"], "eval_loss": s2.get("eval_loss"),
            "rqvae_entropy": s1.get("rqvae_entropy"),
            "wall_s": time.perf_counter() - t0,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if out_path:
            with open(out_path, "w") as f:
                json.dump({"rows": rows}, f)

    ks = ["h@1", "h@5", "h@10", "ndcg"]
    mean = {k: float(np.mean([r[k] for r in rows])) for k in ks}
    sd = {k: float(np.std([r[k] for r in rows], ddof=1)) if len(rows) > 1 else 0.0 for k in ks}
    print("\n| seed | h@1 | h@5 | h@10 | ndcg |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['seed']} | {r['h@1']:.4f} | {r['h@5']:.4f} | {r['h@10']:.4f} | {r['ndcg']:.4f} |")
    print(f"| mean+/-sd | {mean['h@1']:.4f}+/-{sd['h@1']:.4f} "
          f"| {mean['h@5']:.4f}+/-{sd['h@5']:.4f} "
          f"| {mean['h@10']:.4f}+/-{sd['h@10']:.4f} "
          f"| {mean['ndcg']:.4f}+/-{sd['ndcg']:.4f} |")
    print(json.dumps({"rows": rows, "mean": mean, "sd": sd}))


if __name__ == "__main__":
    main()
