"""Classical baseline tests (reference Baseline/*.ipynb semantics)."""

import numpy as np
import pytest

from rlt_tpu.baselines import baseline_table
from rlt_tpu.data import synthetic_dataset
from rlt_tpu.utils import metrics as metrics_lib


def test_oracle_dominates_greedy_dominates_fixed():
    data = synthetic_dataset(num_queries=80, seq_len=50, seed=3, mean_relevant=8.0)
    table = baseline_table(data.y_train, data.y_test, fixed_ks=(5, 10))
    assert table["oracle_f1"] >= table["greedy_f1"] - 1e-6
    assert table["greedy_f1"] >= min(table["fixed_f1@5"], table["fixed_f1@10"]) - 1e-6
    assert table["oracle_dcg"] >= table["greedy_dcg"] - 1e-6


def test_oracle_hand_example():
    # labels [1,0,1]: F1@1 = 2*(1*0.5)/1.5 = 2/3; F1@3 = 2*(2/3*1)/(5/3) = 0.8
    labels = np.asarray([[1, 0, 1]], np.float32)
    assert float(metrics_lib.oracle_score(labels, "f1")) == pytest.approx(
        0.8, abs=1e-6)


def test_greedy_k_picks_best_mean_position():
    # every train row has its single relevant doc first -> greedy k = 1
    labels = np.zeros((4, 6), np.float32)
    labels[:, 0] = 1.0
    assert int(metrics_lib.greedy_k(labels, "f1")) == 1


def test_fixed_k_score_matches_curve_column():
    labels = np.asarray([[1, 1, 0, 0], [0, 1, 1, 0]], np.float32)
    curve = np.asarray(metrics_lib.f1_curve(labels))
    got = float(metrics_lib.fixed_k_score(labels, 2, "f1"))
    np.testing.assert_allclose(got, curve[:, 1].mean(), rtol=1e-6)
