"""Analytic FLOPs model oracle tests (utils/flops.py): hand-computed
values for tiny geometries, and the published accounting conventions
(2mkn per matmul, train = 3x forward)."""

from rqvae_tpu.utils import flops as F


def test_mlp_fwd_flops():
    # dims [2, 3, 4], batch 5: 2*5*2*3 + 2*5*3*4 = 60 + 120
    assert F.mlp_fwd_flops(5, [2, 3, 4]) == 180.0


def test_rqvae_fwd_and_train():
    # batch 2, in 4, hidden (3,), embed 2, K 8, L 2
    enc = 2 * 2 * 4 * 3 + 2 * 2 * 3 * 2  # 48 + 24
    dec = 2 * 2 * 2 * 3 + 2 * 2 * 3 * 4  # 24 + 48
    quant = 2 * (2 * 2 * 2 * 8)  # L * 2*B*e*K
    fwd = F.rqvae_fwd_flops(2, 4, (3,), 2, 8, 2)
    assert fwd == enc + dec + quant
    assert F.rqvae_train_step_flops(2, 4, (3,), 2, 8, 2) == 3 * fwd


def test_retrieval_fwd_flops_hand_check():
    # 1 example, 1 layer, enc_len 2, dec_len 1, d_model 2, 1 head, d_kv 2,
    # d_ff 4, K 8, L 2
    d_inner = 1 * 2
    enc_attn = 2 * 2 * 2 * d_inner * 2 + 2 * 2 * 2 * d_inner * 2 + 2 * 2 * 2 * 2 * d_inner
    enc_ffn = 2 * 2 * 2 * 2 * 4
    self_attn = 2 * 1 * 2 * d_inner * 2 + 2 * 1 * 2 * d_inner * 2 + 2 * 2 * 1 * 1 * d_inner
    cross = 2 * 1 * 2 * d_inner * 2 + 2 * 2 * 2 * d_inner * 2 + 2 * 2 * 1 * 2 * d_inner
    dec_ffn = 2 * 2 * 1 * 2 * 4
    heads = 2 * 2 * 2 * 8
    expected = enc_attn + enc_ffn + self_attn + cross + dec_ffn + heads
    got = F.retrieval_fwd_flops(1, 2, 1, 2, 1, 2, 4, 1, 8, 2)
    assert got == expected, (got, expected)
    assert F.retrieval_train_step_flops(1, 2, 1, 2, 1, 2, 4, 1, 8, 2) == 3 * expected


def test_mfu():
    # 197e12 FLOPs in 1 s at bf16 peak = MFU 1.0
    assert abs(F.mfu(197e12, 1.0, "tpu_v5e_bf16") - 1.0) < 1e-12
    assert abs(F.mfu(197e12 / 3, 1.0, "tpu_v5e_f32_highest") - 1.0) < 1e-12


def test_amazon_stage2_magnitude():
    """The flagship Amazon stage-2 step should be ~2 TFLOP at batch 640
    (VERDICT r4 estimated ~1.9; sanity-bounds the model, not a golden)."""
    f = F.retrieval_train_step_flops(640, 80, 4, 384, 6, 64, 1024, 4, 256, 3)
    assert 1.5e12 < f < 3.0e12, f
