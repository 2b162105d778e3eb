"""Round-3 TPU session 2: after the mask-blockspec lowering fix
(ops/pallas/attention.py — 3-D [B,1,Lk] mask so block_b=2 lowers), measure
the ML-32M long-sequence geometry with the fused kernel, regression-check
the Amazon geometry, and get the ML-32M beam number. One process."""

import functools
import json
import sys
import traceback

from ab_stage2_step import run_scan
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


def with_block(bb, fn, *a, **kw):
    import rqvae_tpu.ops.pallas.attention as A

    orig = A.t5_attention
    A.t5_attention = functools.partial(orig, block_b=bb)
    try:
        return fn(*a, **kw)
    finally:
        A.t5_attention = orig


def main():
    tasks = {1, 2, 3, 4}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}

    if 1 in tasks:  # regression: flagship Amazon geometry still ~38 ms/step
        task("amazon_step_fused", run_scan, "auto", 640, 20, 25)
    if 2 in tasks:  # the round-2 verdict's unknown: fused at 800-token rows
        task("ml32m_step_fused", run_scan, "auto", 64, 200, 10)
    if 3 in tasks:  # block_b=4 probe (working set ~68MB, inside the 100MB limit)
        task("ml32m_step_fused_bb4", with_block, 4, run_scan, "auto", 64, 200, 10)
    if 4 in tasks:
        task("ml32m_beam", run_beam, "auto", 64, 200, 10)

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
