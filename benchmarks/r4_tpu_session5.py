"""Round-4 TPU session 5: the SHIPPED configuration, end to end.

The Le<=128 fused-decode block cap dropped 32 -> 16 after session 4's OOM
inside the fused Retriever query (the kernel compiled standalone at bb=32
but the surrounding program's scratch lowered the effective scoped-vmem
ceiling). Re-measure everything the cap touches, then the SLO sweep with
the pipelined queue + single-dispatch query.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_tpu_session5.py [--tasks ...]
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
    print(json.dumps(RESULTS[-1], default=str), flush=True)


def engine_bench():
    import engine_bench as eb

    sys.argv = ["engine_bench.py"]
    eb.main()
    return {}


def slo_v2():
    import slo_bench

    sys.argv = ["slo_bench.py", "--loads", "250,500,1000,2000", "--seconds", "12"]
    slo_bench.main()
    return {}


def main():
    tasks = {1, 2, 3, 4}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}
    if 1 in tasks:  # headline geometries at the shipped bb=16 cap
        task("amazon_fd_bb16", run_beam, "auto", 64, 20)  # auto now serves fd
        task("amazon_off", run_beam, "auto", 64, 20, fused_decode="off")
        task("le128_fd_bb16", run_beam, "auto", 64, 32)
    if 2 in tasks:
        task("amazon_b256_fd_bb16", run_beam, "auto", 256, 20)
    if 3 in tasks:
        task("engine_bench_bb16", engine_bench)
    if 4 in tasks:
        task("slo_v2_pipelined", slo_v2)

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r, default=str))


if __name__ == "__main__":
    main()
