"""Run several benchmark harnesses in ONE python process — the axon TPU
tunnel penalizes process churn (new sessions are refused for minutes after
an exit, and every process pays remote-compile latency).

Each positional argument is a full harness invocation, quoted; paths are
relative to this directory. Failures are contained per-harness.

  python benchmarks/tpu_session.py \
      "step_phases.py auto --batch 64 --items 200" \
      "ab_stage2_step.py auto --steps 25"
"""

import os
import runpy
import sys
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    for spec in sys.argv[1:]:
        argv = spec.split()
        argv[0] = os.path.join(HERE, os.path.basename(argv[0]))
        print(f"\n=== {' '.join(argv)} ===", flush=True)
        sys.argv = argv
        try:
            runpy.run_path(argv[0], run_name="__main__")
        except Exception:
            traceback.print_exc()
            print("HARNESS FAILED (continuing)", flush=True)


if __name__ == "__main__":
    main()
