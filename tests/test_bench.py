"""Pin the analytic-FLOPs model used for bench MFU reporting.

XLA's compiled cost_analysis() counts each lax.scan body once regardless of
trip count, so bench.py prices FLOPs analytically (dominant matmul terms).
These tests pin that model's structure: linear scaling in steps, the
fwd+2x-backward train multiplier, and a hand-derived value for the
mmoecut trunk (reference MMOECut.py:56-110 shapes).
"""

import bench


def test_model_fwd_flops_all_models_positive():
    for m in bench.MODELS:
        assert bench.model_fwd_flops(m, 300, 47) > 0
        assert bench.model_fwd_flops(m, 40, 25) > 0


def test_epoch_flops_scale_linearly_with_steps():
    base = bench.analytic_flops_per_epoch("mmoecut", 300, 47, 63, 4, 1)
    scaled = bench.analytic_flops_per_epoch("mmoecut", 300, 47, 63, 32, 8)
    assert abs(scaled / base - 8.0) < 1e-9  # (32*3+8)/(4*3+1) = 8 exactly


def test_train_step_is_three_forwards():
    fwd_only = bench.analytic_flops_per_epoch("attncut", 300, 47, 63, 0, 1)
    one_train = bench.analytic_flops_per_epoch("attncut", 300, 47, 63, 1, 0)
    assert one_train == 3 * fwd_only


def test_lstm_flops_hand_value():
    # 1 layer, 1 timestep, F=H=128, bidir: 2 * (2*128*512 + 2*128*512)
    assert bench._lstm_fwd_flops(1, 128, H=128, layers=1) == 2 * 4 * 128 * 512


def test_transformer_flops_hand_value():
    # L=1 kills the L^2 terms' dominance but keeps all matmuls countable
    L, D, ff = 1, 256, 2048
    expected = 2 * L * D * 3 * D + 4 * L * L * D + 2 * L * D * D + 4 * L * D * ff
    assert bench._transformer_fwd_flops(L, D, 1, ff=ff) == expected
