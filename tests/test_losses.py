"""Loss correctness vs torch oracles (torch.nn.KLDivLoss / BCELoss give us an
independent implementation of the exact reduction semantics the reference
relies on) and numpy loop oracles for the reward math."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rlt_tpu.utils import losses as L
from tests.test_metrics import oracle_dcg, oracle_f1


def _reward(labels, metric):
    B, seq = labels.shape
    r = np.zeros((B, seq), dtype=np.float64)
    for i in range(B):
        for j in range(seq):
            r[i, j] = (
                oracle_f1(labels[i], j + 1) if metric == "f1" else oracle_dcg(labels[i], j + 1)
            )
    return r


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.fixture
def batch(rng):
    B, seq = 4, 25
    labels = (rng.random((B, seq)) < 0.35).astype(np.float32)
    labels[:, 0] = 1.0
    logits = rng.normal(size=(B, seq)).astype(np.float32)
    p = _softmax(logits).astype(np.float32)
    return p[:, :, None], labels


@pytest.mark.parametrize("metric", ["f1", "dcg"])
def test_choopy_loss(batch, metric):
    p, labels = batch
    got = float(L.choopy_loss(jnp.array(p), jnp.array(labels), metric=metric))
    r = _reward(labels, metric)
    expected = -np.sum(p[..., 0] * r) / p.shape[0]
    assert got == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize("metric", ["f1", "dcg"])
def test_attncut_loss(batch, metric):
    p, labels = batch
    tau = 0.95
    got = float(L.attncut_loss(jnp.array(p), jnp.array(labels), metric=metric, tau=tau))
    q = _softmax(_reward(labels, metric) / tau)
    expected = -np.sum(q * np.log(p[..., 0])) / p.shape[0]
    assert got == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize("div_type", ["kl", "js"])
@pytest.mark.parametrize("augmented", [True, False])
def test_div_loss_matches_torch_kldiv(batch, div_type, augmented):
    p, labels = batch
    tau = 0.85 if augmented else 1.0
    got = float(
        L.div_loss(
            jnp.array(p), jnp.array(labels),
            metric="f1", tau=0.85, div_type=div_type, augmented=augmented,
        )
    )
    q = torch.tensor(_softmax(_reward(labels, "f1") / tau), dtype=torch.float64)
    pt = torch.tensor(p[..., 0], dtype=torch.float64)
    kld = torch.nn.KLDivLoss(reduction="batchmean")
    if div_type == "kl":
        expected = kld(pt.log(), q)
    else:
        log_mean = ((pt + q) / 2).log()
        expected = (kld(log_mean, q) + kld(log_mean, pt)) / 2
    assert got == pytest.approx(float(expected), rel=1e-4)


def test_bce_matches_torch(batch, rng):
    _, labels = batch
    p = rng.uniform(0.01, 0.99, size=labels.shape).astype(np.float32)
    got = float(L.bce_loss(jnp.array(p[:, :, None]), jnp.array(labels)))
    expected = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(labels))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_rerank_loss(batch):
    p, labels = batch
    got = float(L.rerank_loss(jnp.array(p), jnp.array(labels)))
    flat_p, flat_y = p[..., 0], labels
    pos_mean = flat_p[flat_y == 1].mean()
    neg_mean = flat_p[flat_y == 0].mean()
    expected = max(0.0, neg_mean - pos_mean + 5e-4)
    assert got == pytest.approx(expected, rel=1e-5)


def test_rerank_loss_degenerate():
    p = np.full((2, 5, 1), 0.2, dtype=np.float32)
    all_pos = np.ones((2, 5), dtype=np.float32)
    assert float(L.rerank_loss(jnp.array(p), jnp.array(all_pos))) == 0.0


def _bicut_oracle(output, labels, metric, alpha, r_param):
    B, seq, _ = output.shape
    loss = 0.0
    for i in range(B):
        decisions = np.argmax(output[i], axis=1)
        if decisions.sum() == seq:
            cut = seq
        else:
            cut = seq - 1 - int(np.argmin(decisions[::-1]))
        mask = np.ones((seq, 2))
        mask[cut + 1:] = 0.0
        rew = np.zeros((seq, 2))
        for j in range(seq):
            if metric == "nci":
                rew[j] = [0, -1 / math.log2(j + 2)] if labels[i, j] == 1 else [0, (j + 1) / alpha]
            else:
                rew[j] = (
                    [(1 - alpha) / r_param, 0] if labels[i, j] == 1 else [0, alpha / (1 - r_param)]
                )
        loss += np.sum(output[i] * mask * rew)
    return loss / B


@pytest.mark.parametrize("metric", ["nci", "dcg"])
def test_bicut_loss(rng, metric):
    B, seq = 5, 20
    labels = (rng.random((B, seq)) < 0.4).astype(np.float32)
    logits = rng.normal(size=(B, seq, 2)).astype(np.float32)
    output = _softmax(logits, axis=-1).astype(np.float32)
    # row with all-continue decisions
    output[3, :, 0] = 0.1
    output[3, :, 1] = 0.9
    got = float(L.bicut_loss(jnp.array(output), jnp.array(labels), metric=metric))
    expected = _bicut_oracle(output, labels, metric, 0.65, 0.0971134020)
    assert got == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize("num_tasks", [3, 2.1, 2.2])
def test_mtcut_loss_composition(batch, rng, num_tasks):
    p, labels = batch
    class_p = rng.uniform(0.01, 0.99, size=labels.shape).astype(np.float32)[:, :, None]
    rerank_p = rng.normal(size=labels.shape).astype(np.float32)[:, :, None]
    if num_tasks == 3:
        outputs = [class_p, rerank_p, p]
    elif num_tasks == 2.1:
        outputs = [class_p, p]
    else:
        outputs = [rerank_p, p]
    got = float(
        L.mtcut_loss(
            [jnp.array(o) for o in outputs], jnp.array(labels),
            metric="f1", rerank_weight=0.4, classi_weight=0.6, num_tasks=num_tasks,
        )
    )
    cut = float(L.div_loss(jnp.array(p), jnp.array(labels), metric="f1", div_type="js"))
    expected = cut
    if num_tasks in (3, 2.2):
        expected += 0.4 * float(L.rerank_loss(jnp.array(rerank_p), jnp.array(labels)))
    if num_tasks in (3, 2.1):
        expected += 0.6 * float(L.bce_loss(jnp.array(class_p), jnp.array(labels)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_wass_dist_loss_runs_and_is_nonnegative(batch):
    p, labels = batch
    got = float(L.wass_dist_loss(jnp.array(p), jnp.array(labels)))
    assert np.isfinite(got)
    assert got >= 0.0


@pytest.mark.parametrize(
    "loss_name,kwargs",
    [
        ("choopy", dict(metric="f1")),
        ("attncut", dict(metric="dcg")),
        ("div", dict(metric="f1", div_type="js")),
        ("rerank", {}),
        ("bce", {}),
        ("bicut", dict(metric="dcg")),
        ("bicut", dict(metric="nci")),
    ],
)
def test_valid_mask_matches_subset(rng, loss_name, kwargs):
    """Padding rows + valid mask must reproduce the unpadded loss exactly."""
    B, seq = 5, 15
    labels = (rng.random((B, seq)) < 0.4).astype(np.float32)
    labels[:, 0] = 1.0
    labels[:, 1] = 0.0
    p = _softmax(rng.normal(size=(B, seq)).astype(np.float32))[:, :, None]
    if loss_name == "bce":
        p = rng.uniform(0.01, 0.99, size=(B, seq, 1)).astype(np.float32)
    if loss_name == "bicut":  # (B, L, 2) per-position decision pairs
        p = _softmax(rng.normal(size=(B, seq, 2)).astype(np.float32), axis=-1)
    loss = L.make_loss(loss_name, **kwargs)
    unpadded = float(loss(jnp.array(p[:3]), jnp.array(labels[:3])))
    valid = jnp.array([1, 1, 1, 0, 0], dtype=jnp.float32)
    padded = float(loss(jnp.array(p), jnp.array(labels), valid=valid))
    assert padded == pytest.approx(unpadded, rel=1e-5)


def test_wass_loss_padding_invariant():
    """Padded rows with valid=0 must not change the OT loss (review finding)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    p = rng.random((4, 10)).astype(np.float32)
    p = p / p.sum(axis=1, keepdims=True)
    y = (rng.random((4, 10)) < 0.4).astype(np.float32)
    # compare at full convergence: the early-stopping error norm sees the
    # padded dims, so trajectories differ before the fixed point
    kw = dict(max_iter=2000, threshold=0.0)
    base = float(L.wass_dist_loss(jnp.asarray(p), jnp.asarray(y), **kw))
    p_pad = np.concatenate([p, np.zeros((2, 10), np.float32)])
    y_pad = np.concatenate([y, np.zeros((2, 10), np.float32)])
    valid = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    padded = float(L.wass_dist_loss(jnp.asarray(p_pad), jnp.asarray(y_pad),
                                    valid=valid, **kw))
    np.testing.assert_allclose(padded, base, rtol=1e-3, atol=1e-4)


def test_bce_saturated_matches_torch_clamp(rng):
    """torch BCELoss clamps each log term at -100, so exactly-saturated
    probabilities (p==0 on a relevant doc / p==1 on an irrelevant one) give a
    large FINITE loss with finite gradients instead of inf/NaN — the failure
    mode that would silently kill an mtcut-family run once a classi head
    saturates (torch binary_cross_entropy semantics)."""
    import jax

    p = np.array([[0.0, 1.0, 0.5, 0.3]], dtype=np.float32)
    y = np.array([[1.0, 0.0, 1.0, 0.0]], dtype=np.float32)
    val, grad = jax.value_and_grad(
        lambda q: L.bce_loss(q[..., None], jnp.array(y)))(jnp.array(p))
    tp = torch.tensor(p, requires_grad=True)
    tl = torch.nn.BCELoss()(tp, torch.tensor(y))
    tl.backward()
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(grad)).all()
    np.testing.assert_allclose(float(val), tl.item(), rtol=1e-6)
