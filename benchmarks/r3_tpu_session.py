"""Round-3 TPU measurement session — everything in ONE process (the axon
tunnel penalizes process churn: new sessions are refused for minutes after
an exit, and every process pays remote-compile latency).

Covers the round-2 verdict's hardware items:
  1. Mosaic-under-shard_map lowering proof: compiled shard_map DP step with
     the fused Pallas attention + hash dropout on the real chip.
  2. ML-32M flagship geometry (batch 64, 200 items ~= 800-token encoder
     rows): fused-vs-XLA stage-2 step A/B — the regime where the backward's
     whole-row score buffers force block_b=2.
  3. Amazon-geometry batch scaling (640 -> 1280 -> 2560): MXU under-fill
     probe at d_model 384.
  4. ML-32M-geometry constrained-beam QPS (Le ~= 800; serving always runs
     the XLA attention path — models/t5.py:_use_fused).

Usage: python benchmarks/r3_tpu_session.py [--tasks 1,2,3,4]
"""

import json
import sys
import traceback

from ab_stage2_step import run_scan, run_shardmap
from beam_amortized import run_beam

RESULTS = []


def task(name, fn, *a, **kw):
    print(f"\n=== {name} ===", flush=True)
    try:
        r = fn(*a, **kw)
        RESULTS.append({"task": name, **r})
    except Exception as e:
        traceback.print_exc()
        RESULTS.append({"task": name, "error": f"{type(e).__name__}: {e}"})
    print(json.dumps(RESULTS[-1]), flush=True)


def main():
    tasks = {1, 2, 3, 4}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}

    if 1 in tasks:
        task("shardmap_amazon", run_shardmap, "auto", 640, 20)
    if 2 in tasks:
        task("ml32m_step_xla", run_scan, "off", 64, 200, 10)
        task("ml32m_step_fused", run_scan, "auto", 64, 200, 10)
    if 3 in tasks:
        task("amazon_step_b1280", run_scan, "auto", 1280, 20, 10)
        task("amazon_step_b2560", run_scan, "auto", 2560, 20, 10)
    if 4 in tasks:
        # serving always uses the XLA attention path (the kernel's win is the
        # backward; models/t5.py:_use_fused), so one measurement suffices
        task("ml32m_beam", run_beam, "auto", 64, 200, 10)

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
