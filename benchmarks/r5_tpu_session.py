"""Round-5 combined TPU session: flagship multi-seed quality (VERDICT r4
Next #5) + on-chip dedup-sort micro (VERDICT r4 Next #6) in ONE process,
because the tunnel charges a multi-minute setup/compile tax per process
and refuses new sessions for ~5-10 min after one exits (CLAUDE.md).

Usage: PYTHONPATH=/root/repo python benchmarks/r5_tpu_session.py
"""

import runpy
import sys

sys.path.insert(0, "/root/repo")


def run(script, argv):
    sys.argv = [script] + argv
    print(f"\n=== {script} {' '.join(argv)} ===", flush=True)
    runpy.run_path(script, run_name="__main__")


def main():
    run("benchmarks/dedup_sort_micro.py", [])
    # SLO v5 (VERDICT r4 Next #4 "done" criterion): admitted-request
    # latency bounded at 2x/4x past the ~1.9k QPS knee via depth+deadline.
    run("benchmarks/slo_bench.py",
        ["--loads", "1000,2000,4000,8000", "--seconds", "12",
         "--depth", "256", "--deadline-ms", "500"])
    run("benchmarks/flagship_seeds.py",
        ["--seeds", "0,1,2", "--out", "out/r5/flagship_seeds.json"])


if __name__ == "__main__":
    main()
