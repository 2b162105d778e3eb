"""Train-step MFU table (VERDICT r4 Next #3): measured step time vs the
analytic FLOPs model (rqvae_tpu/utils/flops.py) at both flagship
geometries, on the real chip. Differential fori_loop timing cancels the
tunnel RTT (rqvae_tpu/train/perf.py).

Rows:
- stage 1 Amazon (768->[512,256,128]->32, 3x256, batch 640), f32 and bf16
- stage 2 Amazon (d_model 384/6h/1024ff/4L, batch 640, 20-item rows), bf16
- stage 2 ML-32M geometry (batch 64, 200-item rows -> 800-token encoder),
  bf16 (configs/decoder_ml32m.gin)

Usage: PYTHONPATH=/root/repo python benchmarks/mfu_bench.py [--quick]
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from rqvae_tpu.train.perf import measure_stage1_step, measure_stage2_step

    quick = "--quick" in sys.argv
    print(f"backend={jax.default_backend()}", flush=True)
    rows = {}

    rows["stage1_amazon_f32"] = measure_stage1_step(
        **({"r1": 20, "r2": 120} if quick else {})
    )
    print(json.dumps({"row": "stage1_amazon_f32", **rows["stage1_amazon_f32"]}), flush=True)

    rows["stage1_amazon_bf16"] = measure_stage1_step(
        bf16=True, **({"r1": 20, "r2": 120} if quick else {})
    )
    print(json.dumps({"row": "stage1_amazon_bf16", **rows["stage1_amazon_bf16"]}), flush=True)

    rows["stage2_amazon_bf16"] = measure_stage2_step(
        **({"r1": 3, "r2": 23} if quick else {})
    )
    print(json.dumps({"row": "stage2_amazon_bf16", **rows["stage2_amazon_bf16"]}), flush=True)

    rows["stage2_ml32m_bf16"] = measure_stage2_step(
        batch=64, max_seq_len=200, n_rows=2000, n_corpus=50000,
        **({"r1": 3, "r2": 23} if quick else {"r1": 3, "r2": 43}),
    )
    print(json.dumps({"row": "stage2_ml32m_bf16", **rows["stage2_ml32m_bf16"]}), flush=True)

    print("\n| geometry | ms/step | ex/s | TFLOP/step | MFU | peak basis |")
    print("|---|---|---|---|---|---|")
    for name, r in rows.items():
        print(
            f"| {name} | {r['seconds_per_step'] * 1e3:.2f} "
            f"| {r['examples_per_sec']:.0f} | {r['flops_per_step'] / 1e12:.3f} "
            f"| {100 * r['mfu']:.1f}% | {r['peak']} |"
        )
    print(json.dumps({k: {kk: vv for kk, vv in v.items()} for k, v in rows.items()}))


if __name__ == "__main__":
    main()
