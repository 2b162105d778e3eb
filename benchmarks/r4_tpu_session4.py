"""Round-4 TPU session 4: serving-queue pipelining A/B + flagship dryrun
executed on the chip.

Session 3's SLO v1 saturated at ~170 sustained QPS through the tunnel at
EVERY offered load: one flush of 64 requests costs ~10 serialized
transport round trips (per-bucket-group tokenize dispatch + query dispatch
+ blocking value fetch, all on one worker). Two fixes land here:
  - the Retriever query is ONE dispatch (tokenization fused into the jit);
  - the queue pipelines dispatch and host fetch (resolver thread).

PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_tpu_session4.py [--tasks 1,2]
"""

import json
import sys
import traceback

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


def slo_v2():
    import slo_bench

    sys.argv = ["slo_bench.py", "--loads", "250,500,1000,2000", "--seconds", "12"]
    slo_bench.main()
    return {}


def main():
    tasks = {1, 2}
    if "--tasks" in sys.argv:
        tasks = {int(t) for t in sys.argv[sys.argv.index("--tasks") + 1].split(",")}
    if 1 in tasks:
        task("slo_v2_pipelined", slo_v2)
    if 2 in tasks:
        task("flagship_dryrun_chip", flagship_on_chip)

    print("\n=== session summary ===")
    for r in RESULTS:
        print(json.dumps(r, default=str))


if __name__ == "__main__":
    main()
