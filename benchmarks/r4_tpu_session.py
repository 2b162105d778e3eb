"""Round-4 TPU session 1: chip-prove the two round-3 serving-stack kernels
(ops/pallas/decoder_stack.py, ops/pallas/encoder_stack.py) that have only
ever run in interpret mode — VERDICT r3 Next #1.

Order: the riskiest compiles FIRST (Mosaic CHECK-fails SIGABRT the whole
process; if the fused-decode level-0 kT=8 pad or the encoder's rank-1
mask matmul fails to lower, we learn that in task 1/3, not after 20 min
of A/B timing). Then beam_amortized A/Bs at both flagship geometries.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_tpu_session.py [--tasks 1,2,...]
"""

import json
import sys
import traceback

from beam_amortized import run_beam
from beam_equivalence import run_equivalence

RESULTS = []


def task(name, fn, *a, **kw):
    print(f"\n=== {name} ===", flush=True)
    try:
        r = fn(*a, **kw)
        RESULTS.append({"task": name, **(r or {})})
    except Exception as e:
        traceback.print_exc()
        RESULTS.append({"task": name, "error": f"{type(e).__name__}: {e}"})
    print(json.dumps(RESULTS[-1]), flush=True)


def main():
    tasks = {1, 2, 3, 4, 5, 6, 7, 8}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}

    # --- compile proofs + output equality (kernel "on" vs "off") ---
    if 1 in tasks:  # fused decoder stack, Amazon geometry (its target)
        task("eq_decode_amazon", run_equivalence, "fused_decode", 20)
    if 2 in tasks:  # fused decoder stack at long Le (KV-cache block slicing)
        task("eq_decode_ml32m", run_equivalence, "fused_decode", 200)
    if 3 in tasks:  # fused encoder stack, ML-32M geometry (its target)
        task("eq_encode_ml32m", run_equivalence, "fused_encode", 200)

    # --- A/B timings (beam_amortized, fold-proof scan, best-of-5) ---
    if 4 in tasks:  # Amazon baseline = shipped config (both kernels decline)
        task("amazon_base", run_beam, "auto", 64, 20)
    if 5 in tasks:  # Amazon + fused decode
        task("amazon_fd", run_beam, "auto", 64, 20, fused_decode="on")
    if 6 in tasks:  # ML-32M baseline
        task("ml32m_base", run_beam, "auto", 64, 200)
    if 7 in tasks:  # ML-32M + fused encode
        task("ml32m_fe", run_beam, "auto", 64, 200, fused_encode="on")
    if 8 in tasks:  # ML-32M + both
        task("ml32m_fd_fe", run_beam, "auto", 64, 200,
             fused_decode="on", fused_encode="on")

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
