"""Merge head-to-head partial results (benchmarks/ref_headtohead.py --side
ours/ref runs write per-side JSON via --out; the torch side runs on CPU
while ours runs on the TPU) into one per-seed table with mean +/- sd.

Usage: python benchmarks/h2h_merge.py out/r5/h2h_ours_tpu.json \
    out/r5/h2h_ref.json out/r5/h2h_ref_s2.json [--out merged.json]
"""

import json
import sys

import numpy as np

KS = ("h@1", "h@5", "h@10", "ndcg")


def main():
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    by_seed = {}
    meta = {}
    for path in argv:
        with open(path) as f:
            blob = json.load(f)
        for k in ("s1_iters", "s2_iters", "batch"):
            if k in blob:
                if k in meta and meta[k] != blob[k]:
                    raise SystemExit(f"budget mismatch across files: {k}")
                meta[k] = blob[k]
        for row in blob["rows"]:
            by_seed.setdefault(row["seed"], {}).update(
                {k: v for k, v in row.items() if k != "seed"})

    seeds = sorted(by_seed)
    sides = [s for s in ("ours_deterministic", "ours_sampled", "reference")
             if any(s in by_seed[sd] for sd in seeds)]
    print(f"budget: {meta}")
    print("\n| seed | side | h@1 | h@5 | h@10 | ndcg |")
    print("|---|---|---|---|---|---|")
    for sd in seeds:
        for side in sides:
            if side not in by_seed[sd]:
                continue
            m = by_seed[sd][side]
            print(f"| {sd} | {side} | {m['h@1']:.4f} | {m['h@5']:.4f} "
                  f"| {m['h@10']:.4f} | {m['ndcg']:.4f} |")
    stats = {}
    for side in sides:
        vals = {k: [by_seed[sd][side][k] for sd in seeds if side in by_seed[sd]]
                for k in KS}
        n = len(vals["h@1"])
        mean = {k: float(np.mean(v)) for k, v in vals.items()}
        sd_ = {k: (float(np.std(v, ddof=1)) if n > 1 else 0.0)
               for k, v in vals.items()}
        stats[side] = {"n": n, "mean": mean, "sd": sd_}
        print(f"| mean+/-sd (n={n}) | {side} | "
              + " | ".join(f"{mean[k]:.4f}+/-{sd_[k]:.4f}" for k in KS) + " |")
    merged = {"per_seed": {str(s): by_seed[s] for s in seeds},
              "stats": stats, "budget": meta}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
