"""Metric correctness vs independent numpy oracles and the reference's
hand-checkable example (reference utils/metrics.py:104-109)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rlt_tpu.utils import metrics as M


# ---------------------------------------------------------------------------
# Slow, obviously-correct oracles (hand-derived from the metric definitions).
# ---------------------------------------------------------------------------

def oracle_f1(labels, k):
    total = labels.sum()
    count = labels[:k].sum()
    p = count / k
    r = count / total if total != 0 else 0.0
    return 2 * p * r / (p + r) if p + r != 0 else 0.0


def oracle_dcg(labels, k, penalty=-1.0):
    value = 0.0
    for j in range(k):
        value += (1.0 if labels[j] == 1 else penalty) / math.log2(j + 2)
    return value


def test_hand_example_from_reference():
    x = np.array([[1, 0, 1], [0, 0, 1], [1, 0, 0]], dtype=np.float32)
    ks = np.array([1, 2, 1])
    f1 = float(M.f1_at_k(jnp.array(x), jnp.array(ks)))
    dcg = float(M.dcg_at_k(jnp.array(x), jnp.array(ks)))
    expected_f1 = np.mean([oracle_f1(row, k) for row, k in zip(x, ks)])
    expected_dcg = np.mean([oracle_dcg(row, k) for row, k in zip(x, ks)])
    assert f1 == pytest.approx(expected_f1, abs=1e-6)
    assert dcg == pytest.approx(expected_dcg, abs=5e-5)  # float32 log2 rounding
    # concrete values, checkable by hand
    assert f1 == pytest.approx((2 / 3 + 0 + 1) / 3, abs=1e-6)


def test_curves_match_oracle(rng):
    labels = (rng.random((7, 50)) < 0.3).astype(np.float32)
    labels[0] = 0.0  # no-relevant edge case
    f1c = np.asarray(M.f1_curve(jnp.array(labels)))
    dcgc = np.asarray(M.dcg_curve(jnp.array(labels)))
    for i in range(labels.shape[0]):
        for k in range(1, labels.shape[1] + 1):
            assert f1c[i, k - 1] == pytest.approx(oracle_f1(labels[i], k), abs=1e-5)
            assert dcgc[i, k - 1] == pytest.approx(oracle_dcg(labels[i], k), abs=1e-4)


def test_decode_cut(rng):
    scores = rng.random((5, 20, 1)).astype(np.float32)
    ks = np.asarray(M.decode_cut(jnp.array(scores)))
    np.testing.assert_array_equal(ks, np.argmax(scores[..., 0], axis=1) + 1)


def test_decode_cut_bicut_edge_cases():
    # row 0: truncate first at position 2 -> k=3; row 1: all continue -> k=L
    out = np.zeros((2, 5, 2), dtype=np.float32)
    out[..., 1] = 1.0  # default: continue
    out[0, 2] = [0.9, 0.1]  # truncate at j=2
    out[0, 4] = [0.8, 0.2]  # later truncate must not matter (argmin is first)
    ks = np.asarray(M.decode_cut_bicut(jnp.array(out)))
    assert ks[0] == 3
    assert ks[1] == 5


def test_taskr_metric_matches_oracle(rng):
    labels = (rng.random((4, 30)) < 0.4).astype(np.float32)
    preds = rng.random((4, 30)).astype(np.float32)
    got = float(M.taskr_metric(jnp.array(labels), jnp.array(preds)))
    expected = []
    for y, s in zip(labels, preds):
        order = np.argsort(-s, kind="stable")
        expected.append(
            sum(
                (1.0 if y[o] else -1.0) / math.log2(i + 2)
                for i, o in enumerate(order)
            )
        )
    assert got == pytest.approx(np.mean(expected), abs=1e-4)


def test_taskc_metric_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    labels = (rng.random((6, 40)) < 0.3).astype(np.float32)
    labels[2] = 0.0  # degenerate query must be skipped
    preds = rng.random((6, 40)).astype(np.float32)
    got = float(M.taskc_metric(jnp.array(labels), jnp.array(preds)))
    vals = [
        sklearn.roc_auc_score(y, s)
        for y, s in zip(labels, preds)
        if 0 < y.sum() < len(y)
    ]
    assert got == pytest.approx(np.mean(vals), abs=1e-5)


def test_baseline_scores(rng):
    labels = (rng.random((10, 25)) < 0.3).astype(np.float32)
    labels[:, 0] = 1.0
    curve = np.asarray(M.f1_curve(jnp.array(labels)))
    assert float(M.oracle_score(jnp.array(labels), "f1")) == pytest.approx(
        curve.max(axis=1).mean(), abs=1e-6
    )
    k = int(M.greedy_k(jnp.array(labels), "f1"))
    assert k == int(np.argmax(curve.mean(axis=0))) + 1
    assert float(M.fixed_k_score(jnp.array(labels), 5, "f1")) == pytest.approx(
        curve[:, 4].mean(), abs=1e-6
    )


def test_masked_mean_matches_subset(rng):
    labels = (rng.random((8, 20)) < 0.3).astype(np.float32)
    labels[:, 1] = 1.0
    ks = rng.integers(1, 21, size=8)
    valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)
    masked = float(M.f1_at_k(jnp.array(labels), jnp.array(ks), jnp.array(valid)))
    subset = float(M.f1_at_k(jnp.array(labels[:5]), jnp.array(ks[:5])))
    assert masked == pytest.approx(subset, abs=1e-6)


def test_f1_curve_properties(rng):
    """Property checks: F1 in [0,1]; perfect prefix -> F1@n_rel == 1."""
    from rlt_tpu.utils.metrics import f1_curve

    labels = (rng.random((8, 30)) < 0.3).astype(np.float32)
    curve = np.asarray(f1_curve(labels))
    assert curve.min() >= 0.0 and curve.max() <= 1.0 + 1e-6
    perfect = np.zeros((1, 10), np.float32)
    perfect[0, :4] = 1.0
    c = np.asarray(f1_curve(perfect))
    np.testing.assert_allclose(c[0, 3], 1.0, atol=1e-6)


def test_dcg_curve_monotone_for_all_relevant():
    from rlt_tpu.utils.metrics import dcg_curve

    labels = np.ones((1, 12), np.float32)
    curve = np.asarray(dcg_curve(labels))
    assert np.all(np.diff(curve[0]) > 0)  # every kept doc adds gain


def test_oracle_upper_bounds_any_decode(rng):
    from rlt_tpu.utils.metrics import f1_at_k, oracle_score

    labels = (rng.random((16, 25)) < 0.3).astype(np.float32)
    labels[:, 0] = 1.0
    oracle = float(oracle_score(labels, "f1"))
    for _ in range(5):
        ks = rng.integers(1, 26, size=16)
        assert float(f1_at_k(labels, ks)) <= oracle + 1e-6
