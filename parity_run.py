"""One-command real-data parity run: download -> preprocess -> stage-1
RQ-VAE -> stage-2 decoder -> retrieval eval at the reference budgets,
emitting a BASELINE-comparable JSON.

    python parity_run.py --dataset amazon --split beauty
    python parity_run.py --dataset ml1m
    python parity_run.py --dataset ml32m
    python parity_run.py --dataset amazon --quick     # scaled-down sanity run

Budgets come verbatim from configs/{rqvae,decoder}_<dataset>.gin (which
mirror the reference's published hyperparameters; see PARITY.md). On a
networked host this runs end-to-end, downloading raw data on first use
(reference amazon.py:54-60 / ml32m.py:40-42 behavior); on an offline host
it degrades to a clear FileNotFoundError naming the files to place.

Context for the numbers: the reference never publishes its own metrics
(BASELINE.md); the TIGER paper it implements reports Amazon Beauty
Recall@10 ~= 0.0648 / NDCG@10 ~= 0.0384 (arXiv:2305.05065).
"""

from __future__ import annotations

import argparse
import json
import os
import time

CONFIGS = {
    "amazon": ("configs/rqvae_amazon.gin", "configs/decoder_amazon.gin"),
    "amazon_sports": ("configs/rqvae_amazon_sports.gin", "configs/decoder_amazon_sports.gin"),
    "ml1m": ("configs/rqvae_ml1m.gin", "configs/decoder_ml1m.gin"),
    "ml32m": ("configs/rqvae_ml32m.gin", "configs/decoder_ml32m.gin"),
    # hermetic chain check (no downloads): the same machinery on synthetic data
    "synthetic": ("configs/rqvae_synthetic.gin", "configs/decoder_synthetic.gin"),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="amazon", choices=sorted(CONFIGS))
    ap.add_argument("--split", default=None, help="Amazon split override (beauty/sports/toys)")
    ap.add_argument("--workdir", default=None, help="dataset folder (default dataset/<name>)")
    ap.add_argument("--outdir", default=None, help="checkpoint/output root (default out/parity/<name>)")
    ap.add_argument("--out", default=None, help="result JSON path (default <outdir>/parity.json)")
    ap.add_argument("--quick", action="store_true",
                    help="scaled-down budgets (2k/500 iters) for sanity runs")
    ap.add_argument("--set", action="append", default=[], metavar="STAGE.KEY=VALUE",
                    dest="sets",
                    help="extra trainer overrides parsed as Python literals, "
                         "e.g. --set s1.iterations=8 --set s2.batch_size=32 "
                         "--set both.do_eval=False (s1=stage 1, s2=stage 2)")
    args = ap.parse_args()

    # resolve user paths against the INVOCATION cwd before chdir-ing to the
    # repo root (configs use repo-relative paths) — otherwise relative
    # --workdir/--outdir/--out silently land inside the repo tree
    workdir = os.path.abspath(args.workdir) if args.workdir else None
    outdir = os.path.abspath(args.outdir) if args.outdir else None
    out_json = os.path.abspath(args.out) if args.out else None

    root = os.path.dirname(os.path.abspath(__file__))
    os.chdir(root)
    cfg1_path, cfg2_path = CONFIGS[args.dataset]
    # default workdir is per (dataset, split): two Amazon splits at one
    # root would trip ensure_dataset's stamp check
    ds_key = args.dataset + (f"_{args.split}" if args.split else "")
    workdir = workdir or os.path.join("dataset", ds_key)
    outdir = outdir or os.path.join("out", "parity", ds_key)
    out_json = out_json or os.path.join(outdir, "parity.json")

    from rqvae_tpu.train.train_decoder import train as train_decoder
    from rqvae_tpu.train.train_rqvae import train as train_rqvae
    from rqvae_tpu.utils.config import _parse_value, apply_config, parse_config_file

    # --set overrides, applied AFTER --quick clamps (so smoke runs can go
    # below the quick budgets: tests drive this CLI over raw fixtures)
    set1, set2 = {}, {}
    for item in args.sets:
        try:
            key, raw = item.split("=", 1)
            stage, name = key.split(".", 1)
        except ValueError:
            raise SystemExit(f"--set expects STAGE.KEY=VALUE, got {item!r}")
        if stage not in ("s1", "s2", "both"):
            raise SystemExit(f"--set stage must be s1/s2/both, got {stage!r}")
        val = _parse_value(raw)
        if stage in ("s1", "both"):
            set1[name] = val
        if stage in ("s2", "both"):
            set2[name] = val

    result = {
        "dataset": args.dataset,
        "split": args.split,
        "quick": args.quick,
        "stage1_config": cfg1_path,
        "stage2_config": cfg2_path,
        "tiger_paper_amazon_beauty": {"recall@10": 0.0648, "ndcg@10": 0.0384},
    }

    # ---- stage 1: RQ-VAE tokenizer at the reference budget ----
    cfg1 = parse_config_file(cfg1_path)
    ov1 = {"dataset_folder": workdir, "save_dir_root": os.path.join(outdir, "rqvae")}
    if args.split:
        ov1["dataset_split"] = args.split
    if args.quick:
        it1 = min(cfg1.get("iterations", 2000), 2000)
        ov1.update(iterations=it1, eval_every=it1, save_model_every=it1)
    ov1.update(set1)
    if "iterations" in set1:
        # keep cadences consistent with a clamped budget — but never clobber
        # a cadence the user ALSO set explicitly
        ov1.setdefault("eval_every", set1["iterations"])
        if "save_model_every" not in set1:
            ov1["save_model_every"] = min(
                ov1.get("save_model_every", set1["iterations"]), set1["iterations"]
            )
    t0 = time.time()
    s1 = apply_config(train_rqvae, cfg1_path, **ov1)
    result["stage1"] = {k: v for k, v in s1.items() if isinstance(v, (int, float, str)) or v is None}
    result["stage1_wall_s"] = time.time() - t0
    ckpt = s1["checkpoint_path"]
    if not ckpt:
        raise RuntimeError("stage 1 produced no checkpoint")
    print(f"[parity] stage 1 done: {ckpt}")

    # ---- stage 2: decoder at the reference budget, frozen stage-1 ckpt ----
    cfg2 = parse_config_file(cfg2_path)
    ov2 = {
        "dataset_folder": workdir,
        "save_dir_root": os.path.join(outdir, "decoder"),
        "pretrained_rqvae_path": ckpt,
    }
    if args.split:
        ov2["dataset_split"] = args.split
    if args.quick:
        it = min(cfg2.get("iterations", 500), 500)
        ov2.update(
            iterations=it, partial_eval_every=it, full_eval_every=it,
            save_model_every=it, warmup_steps=min(cfg2.get("warmup_steps", 10000), 100),
        )
    ov2.update(set2)
    if "iterations" in set2:
        # keep cadences consistent with a clamped budget — but never clobber
        # a cadence the user ALSO set explicitly
        it = set2["iterations"]
        for k in ("partial_eval_every", "full_eval_every", "save_model_every"):
            if k not in set2:
                ov2[k] = min(ov2.get(k, it), it)
        ov2.setdefault("warmup_steps", min(cfg2.get("warmup_steps", 10000), it))
    t0 = time.time()
    s2 = apply_config(train_decoder, cfg2_path, **ov2)
    result["stage2"] = {k: v for k, v in s2.items() if isinstance(v, (int, float, str)) or v is None}
    result["stage2_wall_s"] = time.time() - t0
    result["metrics"] = {k: s2[k] for k in s2 if k.startswith("h@") or k == "ndcg"}

    out_dir = os.path.dirname(out_json)
    if out_dir:  # bare filenames have no directory to create
        os.makedirs(out_dir, exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[parity] wrote {out_json}")
    print(json.dumps({"dataset": args.dataset, **result["metrics"]}))


if __name__ == "__main__":
    main()
