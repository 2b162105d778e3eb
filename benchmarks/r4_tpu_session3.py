"""Round-4 TPU session 3: validate the shipped gate configuration.

1. Le=128 probe — FUSED_DECODE_MAX_LEN=128 is the shipped cap; confirm the
   kernel still wins at exactly the cap (Amazon Le=81 won +22%, Le=512
   lost 13%, Le=256 OOM'd scoped vmem under the current block schedule).
2. dryrun_flagship(1, execute=True) — the flagship-geometry dryrun's
   1-device case executed compiled on the REAL chip (virtual-CPU meshes
   only compile it; VERDICT r3 Next #4).
3. engine_bench re-price — the bucketed-engine mix number re-measured with
   the round-4 auto gates live (VERDICT r3 Next #7): buckets <= 32 items
   now serve the fused decoder-stack kernel, >= 128 items serve the fused
   encoder stack at Le >= 512.
4. slo_bench — offered-load sweep through the async queue (VERDICT r3
   Next #3), measured end to end on the chip.

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_tpu_session3.py [--tasks 1,2,3,4]
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


def flagship_on_chip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g.dryrun_flagship(1, execute=True)


def engine_bench():
    import engine_bench as eb

    eb.main()
    return {}


def slo():
    import slo_bench

    sys.argv = ["slo_bench.py", "--loads", "250,1000,2000,4000", "--seconds", "12"]
    slo_bench.main()
    return {}


def main():
    tasks = {1, 2, 3, 4, 5}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}

    if 1 in tasks:  # Le=128 (items=32): base vs fd — the shipped cap
        task("le128_base", run_beam, "auto", 64, 32, fused_decode="off")
        task("le128_fd", run_beam, "auto", 64, 32, fused_decode="on")
    if 2 in tasks:
        task("flagship_dryrun_chip", flagship_on_chip)
    if 3 in tasks:
        task("engine_bench_repriced", engine_bench)
    if 4 in tasks:
        task("slo_bench", slo)

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r, default=str))


if __name__ == "__main__":
    main()
