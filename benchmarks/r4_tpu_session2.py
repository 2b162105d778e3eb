"""Round-4 TPU session 2: fused-decode length-gate crossover probe.

Session 1 showed the fused decoder-stack kernel WINS at the Amazon
geometry (Le=81: 3.05 -> 2.50 ms/batch) but LOSES at ML-32M (Le=800:
+2.5 ms — the kernel streams the whole [NL,B,H,Le,dk] cross-KV cache
through VMEM per batch block, which XLA's per-level decode reads more
efficiently at long rows). Probe Le=256 and Le=512 to place the gate.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_tpu_session2.py
"""

import json
import sys
import traceback

from beam_amortized import run_beam

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
    tasks = {1, 2, 3, 4, 5, 6}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}
    # items=64 -> Le=256; items=128 -> Le=512 (4 tokens/item incl. sep)
    if 1 in tasks:
        task("le256_base", run_beam, "auto", 64, 64)
    if 2 in tasks:
        task("le256_fd", run_beam, "auto", 64, 64, fused_decode="on")
    if 3 in tasks:
        task("le512_base", run_beam, "auto", 64, 128)
    if 4 in tasks:
        task("le512_fd", run_beam, "auto", 64, 128, fused_decode="on")
    # short-row regression checks at other batch sizes (the engine's
    # bucket grid serves B in {1..64}-ish after mesh rounding)
    if 5 in tasks:
        task("amazon_b256_base", run_beam, "auto", 256, 20)
    if 6 in tasks:
        task("amazon_b256_fd", run_beam, "auto", 256, 20, fused_decode="on")

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
