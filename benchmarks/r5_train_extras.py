"""Round-5 supplementary full-budget runs, one TPU process (the tunnel
charges ~20 min of compile/setup per process — batch the work):

A) Stage-2 at the full 10k x 640 contract from the BEST stage-1
   checkpoint (eval-loss minimum, step 99999) instead of the
   contract-faithful FINAL one (399999) — quantifies what stage-1
   checkpoint selection is worth after the long-horizon codebook drift
   (RESULTS.md "FULL reference stage-1 budget").
B) LR decay-regime proof: the reference's own decoder contract
   (10k iters, warmup 10k — /root/reference/configs/decoder_amazon.gin:3,
   train_decoder.py:151) never leaves warmup; its code DEFAULT
   (iterations=500000, train_decoder.py:27) would. Run the same
   geometry past warmup (warmup 200, 1200 iters) so
   inverse_sqrt_schedule's decay branch executes inside a real training
   loop — the JSONL learning_rate trace is computed from the SAME
   schedule object adamw consumes.

Usage: PYTHONPATH=/root/repo python benchmarks/r5_train_extras.py \
    [--skip a|b] [--out out/r5/train_extras.json]
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    argv = sys.argv[1:]
    skip = argv[argv.index("--skip") + 1] if "--skip" in argv else ""
    out_path = "out/r5/train_extras.json"
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    from rqvae_tpu.train.train_decoder import train as train_decoder
    from rqvae_tpu.utils.config import parse_config_file

    cfg = parse_config_file("configs/decoder_fullbudget.gin")
    results = {}

    if "a" not in skip:
        c = dict(cfg)
        c.update(
            pretrained_rqvae_path="out/rqvae/fullbudget/checkpoint_99999.msgpack",
            save_dir_root="out/decoder/fullbudget_best/",
        )
        t0 = time.perf_counter()
        s = train_decoder(**c)
        results["stage2_from_best_s1"] = {
            k: s.get(k) for k in ("h@1", "h@5", "h@10", "ndcg", "eval_loss",
                                  "total_loss", "rolling_total_loss")
        }
        results["stage2_from_best_s1"]["wall_s"] = time.perf_counter() - t0
        print(json.dumps({"run": "A", **results["stage2_from_best_s1"]}), flush=True)
        _dump(out_path, results)

    if "b" not in skip:
        c = dict(cfg)
        c.update(
            iterations=1200, warmup_steps=200, log_every=100,
            save_model_every=1200, partial_eval_every=600,
            full_eval_every=1200, save_dir_root="out/decoder/decayproof/",
        )
        t0 = time.perf_counter()
        s = train_decoder(**c)
        # verify the decay branch actually ran: reconstruct the LR trace
        lrs = []
        with open("out/decoder/decayproof/logs/metrics.jsonl") as f:
            for line in f:
                r = json.loads(line)
                if "learning_rate" in r:
                    lrs.append((r["step"], r["learning_rate"]))
        decayed = [(st, lr) for st, lr in lrs if st + 1 > 200]
        expect = [
            (st, 0.001 * math.sqrt(200 / (st + 1))) for st, _ in decayed
        ]
        ok = all(abs(a[1] - b[1]) < 1e-9 for a, b in zip(decayed, expect))
        results["decay_proof"] = {
            "lr_trace": lrs, "decay_matches_closed_form": ok,
            "final_loss": s.get("rolling_total_loss"),
            "h@10": s.get("h@10"), "wall_s": time.perf_counter() - t0,
        }
        print(json.dumps({"run": "B", **{k: v for k, v in
              results["decay_proof"].items() if k != "lr_trace"},
              "lr_first3": lrs[:3], "lr_last3": lrs[-3:]}), flush=True)
        _dump(out_path, results)

    print(json.dumps(results))


def _dump(path, results):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
