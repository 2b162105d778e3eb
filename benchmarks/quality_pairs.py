"""Seed-paired kernels-on vs kernels-off quality A/B at the synthetic-big
stage-2 budget (round-2 verdict Weak #3: 2 pairs inside a ±0.03 spread is
statistically thin — extend to >= 4 pairs and report PAIRED deltas).

kernels-on : fused Pallas attention + counter-based hash dropout
kernels-off: XLA attention + flax nn.Dropout
Same seed => same data order, same init, same eval batches; the only delta
is the kernel path, so each pair is a direct paired measurement.

Usage: python benchmarks/quality_pairs.py [seeds...]   (default: 2 3)
Writes out/r3/quality_pairs_<seed>_<arm>.json per run + a summary line.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

CFG = "configs/decoder_synthetic_big.gin"


def run(seed: int, kernels_on: bool) -> dict:
    from rqvae_tpu.utils.config import apply_config

    arm = "on" if kernels_on else "off"
    out = os.path.join("out", "r3", f"qp_decoder_s{seed}_{arm}")
    t0 = time.time()
    from rqvae_tpu.train.train_decoder import train as train_decoder

    s = apply_config(
        train_decoder, CFG,
        seed=seed,
        t5_fused_attention="auto" if kernels_on else "off",
        t5_hash_dropout=kernels_on,
        save_dir_root=out,
        wandb_logging=False,
    )
    rec = {
        "seed": seed, "arm": arm, "wall_s": round(time.time() - t0, 1),
        **{k: s[k] for k in s if k.startswith("h@") or k in ("ndcg", "eval_loss")},
    }
    path = os.path.join("out", "r3", f"quality_pairs_{seed}_{arm}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [2, 3]
    pairs = []
    for seed in seeds:
        on = run(seed, True)
        off = run(seed, False)
        pairs.append({"seed": seed, "delta_h10": on.get("h@10", float("nan")) - off.get("h@10", float("nan")),
                      "on": on, "off": off})
        print(json.dumps({"pair": seed, "delta_h10": pairs[-1]["delta_h10"]}), flush=True)
    print("\n=== paired summary ===")
    for p in pairs:
        print(f"seed {p['seed']}: on h@10={p['on'].get('h@10')} off h@10={p['off'].get('h@10')} "
              f"delta={p['delta_h10']:+.4f}")


if __name__ == "__main__":
    main()
