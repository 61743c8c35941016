"""Fully-vectorized truncation metrics (XLA-native).

Behavioral contract mirrors the reference `utils/metrics.py` (Metric.f1 at
:16-24, Metric.dcg at :27-38, Metric.taskr_metric at :41-58, Metric.taskc_metric
at :61-76, Metric_for_Loss at :79-101), but the design is TPU-first: instead of
per-(sample, k) python loops, every metric is computed for *all* cut positions
at once via cumulative sums, producing a (B, L) "metric curve" tensor. That one
tensor drives

* the reward matrices inside every loss (reference losses.py builds them with
  O(B*L) python iterations of O(L) torch ops each),
* train/eval F1/DCG at the predicted cut (gather at k),
* the classical Fixed-k / Greedy-k / Oracle baselines (fixed index / argmax of
  the mean curve / per-row max).

All functions are pure jnp and safe to call under `jax.jit`.

Conventions: `labels` is a (B, L) binary relevance matrix (float or int);
`k` counts documents (1-based), so column j of a curve corresponds to k = j+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dcg_discount(length: int, dtype=jnp.float32) -> jax.Array:
    """log2(j+2) discount table, j = 0..length-1 (reference metrics.py:7)."""
    j = jnp.arange(length, dtype=dtype)
    return jnp.log2(j + 2.0)


# ---------------------------------------------------------------------------
# Metric curves: value at every possible cut position, one cumsum each.
# ---------------------------------------------------------------------------

def f1_curve(labels: jax.Array) -> jax.Array:
    """F1@k for every k in one shot. Returns (B, L).

    Matches Metric.f1 / Metric_for_Loss.f1: precision = (#relevant in prefix)/k,
    recall = (#relevant in prefix)/(#relevant in list) (0 if the list has no
    relevant doc), F1 = harmonic mean with 0 where P + R == 0.
    """
    labels = labels.astype(jnp.float32)
    cum_rel = jnp.cumsum(labels, axis=-1)  # (B, L)
    k = jnp.arange(1, labels.shape[-1] + 1, dtype=jnp.float32)
    total_rel = cum_rel[..., -1:]
    precision = cum_rel / k
    recall = jnp.where(total_rel > 0, cum_rel / jnp.maximum(total_rel, 1e-30), 0.0)
    denom = precision + recall
    return jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-30), 0.0)


def dcg_curve(labels: jax.Array, penalty: float = -1.0) -> jax.Array:
    """DCG@k for every k, with the reference's irrelevant-doc penalty.

    Matches Metric.dcg / Metric_for_Loss.dcg: each kept relevant doc at rank j
    contributes +1/log2(j+2); each kept irrelevant doc contributes
    penalty/log2(j+2) (penalty = -1 by default). Returns (B, L).
    """
    labels = labels.astype(jnp.float32)
    coef = dcg_discount(labels.shape[-1])
    gains = jnp.where(labels == 1.0, 1.0, penalty) / coef
    return jnp.cumsum(gains, axis=-1)


def reward_matrix(labels: jax.Array, metric: str = "f1") -> jax.Array:
    """(B, L) reward tensor r[i, j] = metric(labels[i], k=j+1).

    Replaces the python double loops that build `r` inside every reference loss
    (losses.py:58-65, :82-89, :217-225).
    """
    if metric == "f1":
        return f1_curve(labels)
    if metric == "dcg":
        return dcg_curve(labels)
    raise ValueError(f"unknown reward metric: {metric!r}")


# ---------------------------------------------------------------------------
# Metrics at a chosen cut.
# ---------------------------------------------------------------------------

def _gather_at_k(curve: jax.Array, ks: jax.Array) -> jax.Array:
    """curve (B, L), ks (B,) 1-based -> (B,) values at the cut."""
    idx = jnp.clip(ks.astype(jnp.int32) - 1, 0, curve.shape[-1] - 1)
    return jnp.take_along_axis(curve, idx[:, None], axis=-1)[:, 0]


def _masked_mean(values: jax.Array, valid: jax.Array | None) -> jax.Array:
    if valid is None:
        return jnp.mean(values)
    valid = valid.astype(values.dtype)
    return jnp.sum(values * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def f1_at_k(labels: jax.Array, ks: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Batch-mean F1 at per-row cuts `ks` (1-based). Reference Metric.f1."""
    return _masked_mean(_gather_at_k(f1_curve(labels), ks), valid)


def dcg_at_k(
    labels: jax.Array,
    ks: jax.Array,
    penalty: float = -1.0,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Batch-mean penalized DCG at per-row cuts `ks`. Reference Metric.dcg."""
    return _masked_mean(_gather_at_k(dcg_curve(labels, penalty), ks), valid)


# ---------------------------------------------------------------------------
# Cut decoding (reference run.py:131-142).
# ---------------------------------------------------------------------------

def decode_cut(scores: jax.Array) -> jax.Array:
    """k = argmax over positions + 1, for (B, L) or (B, L, 1) cut distributions."""
    if scores.ndim == 3:
        scores = scores[..., 0]
    return jnp.argmax(scores, axis=-1).astype(jnp.int32) + 1


def decode_cut_bicut(output: jax.Array) -> jax.Array:
    """BiCut decode rule (run.py:132-136).

    `output` is (B, L, 2) per-position {0: truncate, 1: continue} probabilities.
    decision = argmax over the pair; if every position says continue, k = L;
    otherwise k = (first truncate position) + 1 (np.argmin picks the first 0).
    """
    decisions = jnp.argmax(output, axis=-1)  # (B, L) in {0, 1}
    seq_len = output.shape[1]
    all_continue = jnp.sum(decisions, axis=-1) == seq_len
    first_trunc = jnp.argmin(decisions, axis=-1)  # first 0
    return jnp.where(all_continue, seq_len, first_trunc + 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Auxiliary-task metrics (verification harnesses).
# ---------------------------------------------------------------------------

def taskr_metric(
    labels: jax.Array, predictions: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Rerank DCG: re-sort each list by predicted score, gains are +-1/log2(i+2).

    Reference Metric.taskr_metric (metrics.py:41-58). Batch mean.
    """
    if predictions.ndim == 3:
        predictions = predictions[..., 0]
    order = jnp.argsort(-predictions, axis=-1, stable=True)
    sorted_labels = jnp.take_along_axis(labels.astype(jnp.float32), order, axis=-1)
    coef = dcg_discount(labels.shape[-1])
    per_row = jnp.sum(jnp.where(sorted_labels == 1.0, 1.0, -1.0) / coef, axis=-1)
    return _masked_mean(per_row, valid)


def taskc_metric(
    labels: jax.Array, predictions: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Mean per-query ROC-AUC, skipping all-positive / all-negative queries.

    Reference Metric.taskc_metric (metrics.py:61-76). AUC is computed exactly
    via the pairwise statistic with 0.5 credit for ties, which equals
    sklearn.metrics.roc_auc_score on binary labels.
    """
    if predictions.ndim == 3:
        predictions = predictions[..., 0]
    labels = labels.astype(jnp.float32)

    def one_query(y, s):
        pos = y == 1.0
        neg = ~pos
        # pairwise comparisons: (L, L) — tiny (L <= 300) and MXU/VPU friendly
        gt = (s[:, None] > s[None, :]).astype(jnp.float32)
        eq = (s[:, None] == s[None, :]).astype(jnp.float32)
        pair_mask = pos[:, None] & neg[None, :]
        n_pairs = jnp.sum(pair_mask)
        auc = jnp.sum((gt + 0.5 * eq) * pair_mask) / jnp.maximum(n_pairs, 1.0)
        degenerate = n_pairs == 0
        return auc, degenerate

    aucs, degenerate = jax.vmap(one_query)(labels, predictions)
    keep = ~degenerate
    if valid is not None:
        keep = keep & valid.astype(bool)
    keep = keep.astype(jnp.float32)
    return jnp.sum(aucs * keep) / jnp.maximum(jnp.sum(keep), 1.0)


# ---------------------------------------------------------------------------
# Classical baselines share the same curves (reference Baseline/*.ipynb).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("metric",))
def oracle_score(labels: jax.Array, metric: str = "f1") -> jax.Array:
    """Per-query best-possible value, batch mean (Baseline/Oracle.ipynb cell 6)."""
    return jnp.mean(jnp.max(reward_matrix(labels, metric), axis=-1))


@functools.partial(jax.jit, static_argnames=("metric",))
def greedy_k(train_labels: jax.Array, metric: str = "f1") -> jax.Array:
    """The single k maximizing the mean train curve (Baseline/Greedy_k.ipynb cell 6)."""
    return jnp.argmax(jnp.mean(reward_matrix(train_labels, metric), axis=0)) + 1


@functools.partial(jax.jit, static_argnames=("metric",))
def fixed_k_score(labels: jax.Array, k: int, metric: str = "f1") -> jax.Array:
    """Batch-mean metric at a fixed cut k (Baseline/Fixed_k.ipynb cell 4)."""
    ks = jnp.full((labels.shape[0],), k, dtype=jnp.int32)
    curve = reward_matrix(labels, metric)
    return jnp.mean(_gather_at_k(curve, ks))
