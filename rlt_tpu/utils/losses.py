"""Truncation losses, fully vectorized for XLA.

Behavioral contract mirrors the reference `utils/losses.py` (BiCutLoss :11-45,
ChoopyLoss :48-68, AttnCutLoss :71-96, RerankLoss :99-161, MtCutLoss :164-191,
DivLoss :194-233, WassDistLoss :236-311) — but the reward matrices that the
reference builds with O(B*L) python iterations are here a single cumsum-based
tensor (`rlt_tpu.utils.metrics.reward_matrix`), and the Sinkhorn iteration is a
`lax.while_loop`, so every loss traces into one fused XLA program.

All losses take an optional `valid` (B,) row mask so a ragged final batch can
be padded to a static shape without perturbing the value: padded rows contribute
nothing and all "divide by batch size" normalizations use the true row count.

Each loss is a pure function `loss(output, labels, ...) -> scalar`; `make_loss`
builds a configured callable the trainer can close over (the equivalent of the
reference's criterion-module dispatch in run.py:59-102).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from rlt_tpu.utils.metrics import dcg_discount, reward_matrix

_TINY = 1e-30  # guards log(0) -> -inf; reference uses raw torch.log


def _squeeze_last(x: jax.Array) -> jax.Array:
    return x[..., 0] if x.ndim == 3 else x


def _row_weights(batch: int, valid: jax.Array | None, dtype=jnp.float32):
    if valid is None:
        return jnp.ones((batch,), dtype), jnp.asarray(batch, dtype)
    w = valid.astype(dtype)
    return w, jnp.maximum(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# BiCut (reference losses.py:11-45)
# ---------------------------------------------------------------------------

def bicut_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    metric: str = "nci",
    alpha: float = 0.65,
    r: float = 0.0971134020,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Per-position {truncate, continue} reward loss.

    output: (B, L, 2) softmax over the decision pair. Positions after the model's
    *last* truncate decision are masked out (losses.py:21-34: argmin over the
    flipped decision sequence finds the final 0); if every position says
    continue, nothing is masked. Rewards per (row, position):
      'nci':  relevant -> [0, -1/log2(j+2)],  irrelevant -> [0, (j+1)/alpha]
      else :  relevant -> [(1-alpha)/r, 0],   irrelevant -> [0, alpha/(1-r)]
    loss = sum(output * mask * reward) / batch.
    """
    batch, seq_len, _ = output.shape
    labels = labels.astype(jnp.float32)

    decisions = jnp.argmax(output, axis=-1)  # (B, L) in {0,1}
    all_continue = jnp.sum(decisions, axis=-1) == seq_len
    # last position whose decision is 0 (truncate)
    last_trunc = seq_len - 1 - jnp.argmin(jnp.flip(decisions, axis=-1), axis=-1)
    cut_idx = jnp.where(all_continue, seq_len, last_trunc)  # keep j <= cut_idx
    positions = jnp.arange(seq_len)
    mask = (positions[None, :] <= cut_idx[:, None]).astype(jnp.float32)  # (B, L)

    j1 = positions.astype(jnp.float32) + 1.0
    coef = dcg_discount(seq_len)
    if metric == "nci":
        r_trunc = jnp.zeros((seq_len,))
        r_cont_rel = -1.0 / coef
        r_cont_irr = j1 / alpha
        rew_trunc = jnp.broadcast_to(r_trunc, labels.shape)
        rew_cont = jnp.where(labels == 1.0, r_cont_rel, r_cont_irr)
    else:
        rew_trunc = jnp.where(labels == 1.0, (1.0 - alpha) / r, 0.0)
        rew_cont = jnp.where(labels == 1.0, 0.0, alpha / (1.0 - r))
    reward = jnp.stack([rew_trunc, rew_cont], axis=-1)  # (B, L, 2)

    w, n = _row_weights(batch, valid)
    per_row = jnp.sum(output * mask[:, :, None] * reward, axis=(1, 2))
    return jnp.sum(per_row * w) / n


# ---------------------------------------------------------------------------
# Choopy / AttnCut / Div (reference losses.py:48-96, :194-233)
# ---------------------------------------------------------------------------

def choopy_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    metric: str = "f1",
    valid: jax.Array | None = None,
) -> jax.Array:
    """Negative expected reward: -sum(p * r) / batch (losses.py:56-68)."""
    p = _squeeze_last(output)
    rew = reward_matrix(labels, metric)
    w, n = _row_weights(p.shape[0], valid)
    return -jnp.sum(jnp.sum(p * rew, axis=-1) * w) / n


def _target_distribution(labels: jax.Array, metric: str, tau: float) -> jax.Array:
    """q = softmax(reward / tau) row-wise (losses.py:90-92, :226-228)."""
    return jax.nn.softmax(reward_matrix(labels, metric) / tau, axis=-1)


def attncut_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    metric: str = "f1",
    tau: float = 0.95,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Soft cross-entropy to the reward distribution: -sum(q * log p) / batch."""
    p = _squeeze_last(output)
    q = _target_distribution(labels, metric, tau)
    w, n = _row_weights(p.shape[0], valid)
    per_row = jnp.sum(q * jnp.log(jnp.maximum(p, _TINY)), axis=-1)
    return -jnp.sum(per_row * w) / n


def _kl_batchmean(log_input: jax.Array, target: jax.Array, w: jax.Array, n) -> jax.Array:
    """torch.nn.KLDivLoss(reduction='batchmean')(log_input, target) with row mask."""
    pointwise = target * (jnp.log(jnp.maximum(target, _TINY)) - log_input)
    return jnp.sum(jnp.sum(pointwise, axis=-1) * w) / n


def div_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    metric: str = "f1",
    tau: float = 0.85,
    div_type: str = "kl",
    augmented: bool = True,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Reward-distribution divergence loss (losses.py:194-233).

    q = softmax(r / tau) with tau = `tau` when augmented else 1.
    'kl': KL(q || p) batchmean. 'js': symmetric JS via the log-mean
    (KL(m->q) + KL(m->p)) / 2 with m = (p + q) / 2.
    """
    p = _squeeze_last(output)
    q = _target_distribution(labels, metric, tau if augmented else 1.0)
    w, n = _row_weights(p.shape[0], valid)
    if div_type == "kl":
        return _kl_batchmean(jnp.log(jnp.maximum(p, _TINY)), q, w, n)
    log_mean = jnp.log(jnp.maximum((p + q) / 2.0, _TINY))
    return (_kl_batchmean(log_mean, q, w, n) + _kl_batchmean(log_mean, p, w, n)) / 2.0


# ---------------------------------------------------------------------------
# Rerank hinge (reference losses.py:99-161)
# ---------------------------------------------------------------------------

def rerank_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    margin: float = 5e-4,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Hinge on batch-mean scores of relevant vs irrelevant docs.

    loss = max(0, mean(p[irrelevant]) - mean(p[relevant]) + margin), computed
    over the entire batch at once; 0 when the batch has no positives or no
    negatives (losses.py:134-141).
    """
    p = _squeeze_last(output)
    labels = labels.astype(jnp.float32)
    w, _ = _row_weights(p.shape[0], valid)
    rele = (labels == 1.0).astype(jnp.float32) * w[:, None]
    irre = (labels == 0.0).astype(jnp.float32) * w[:, None]
    n_rele, n_irre = jnp.sum(rele), jnp.sum(irre)
    pos_mean = jnp.sum(rele * p) / jnp.maximum(n_rele, 1.0)
    neg_mean = jnp.sum(irre * p) / jnp.maximum(n_irre, 1.0)
    hinge = jnp.maximum(0.0, neg_mean - pos_mean + margin)
    return jnp.where((n_rele == 0) | (n_irre == 0), 0.0, hinge)


# ---------------------------------------------------------------------------
# Binary cross-entropy (torch.nn.BCELoss, mean reduction)
# ---------------------------------------------------------------------------

def bce_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    valid: jax.Array | None = None,
) -> jax.Array:
    p = _squeeze_last(output)
    y = labels.astype(jnp.float32)
    # torch BCELoss clamps each log term at -100 so a saturated sigmoid
    # (p == 1.0f on an irrelevant doc, or p == 0.0f on a relevant one) yields
    # a large FINITE loss with zero gradient for that element instead of
    # inf/NaN poisoning the whole run (torch/nn/functional binary_cross_entropy
    # semantics; in float32 `1.0 - 1e-12` rounds back to 1.0, so an eps-clip
    # on p cannot provide this guarantee). The inner where/maximum keeps the
    # backward NaN-free: jnp.log's gradient at 0 is inf even when the forward
    # value is later clamped. Known divergence from the torch oracle AT exact
    # saturation only: torch's BCELoss backward divides by
    # max(p*(1-p), eps) and so emits a huge (~1e12) gradient for a saturated
    # element, while this forward-clamp formulation yields gradient 0 there —
    # training dynamics can differ after a head fully saturates (never
    # observed pre-saturation; see RESULTS.md "Torch A/B parity").
    tiny = jnp.finfo(jnp.float32).tiny
    q = 1.0 - p
    log_p = jnp.maximum(
        jnp.where(p <= 0.0, -jnp.inf, jnp.log(jnp.maximum(p, tiny))), -100.0)
    log_1mp = jnp.maximum(
        jnp.where(q <= 0.0, -jnp.inf, jnp.log(jnp.maximum(q, tiny))), -100.0)
    pointwise = -(y * log_p + (1.0 - y) * log_1mp)
    w, n = _row_weights(p.shape[0], valid)
    return jnp.sum(jnp.sum(pointwise, axis=-1) * w) / (n * p.shape[-1])


# ---------------------------------------------------------------------------
# Multi-task composition (reference losses.py:164-191)
# ---------------------------------------------------------------------------

def mtcut_loss(
    outputs: list[jax.Array],
    labels: jax.Array,
    *,
    metric: str = "f1",
    rerank_weight: float = 0.5,
    classi_weight: float = 0.5,
    num_tasks: float = 3,
    valid: jax.Array | None = None,
) -> jax.Array:
    """cut (JS DivLoss, augmented) + weighted rerank hinge + weighted BCE.

    num_tasks selects heads exactly as losses.py:180-191:
      3   -> outputs = [class, rerank, cut]
      2.1 -> outputs = [class, cut]
      2.2 -> outputs = [rerank, cut]
    All three tasks share the same binary relevance labels.
    """
    if num_tasks == 3:
        pred_y, rerank_y, cut_y = outputs
    elif num_tasks == 2.1:
        pred_y, cut_y = outputs
        rerank_y = None
    else:
        rerank_y, cut_y = outputs
        pred_y = None

    total = div_loss(cut_y, labels, metric=metric, div_type="js", augmented=True, valid=valid)
    if rerank_y is not None:
        total = total + rerank_weight * rerank_loss(rerank_y, labels, valid=valid)
    if pred_y is not None:
        total = total + classi_weight * bce_loss(pred_y, labels, valid=valid)
    return total


# ---------------------------------------------------------------------------
# Sinkhorn / Wasserstein (reference losses.py:236-311)
# ---------------------------------------------------------------------------

def wass_dist_loss(
    output: jax.Array,
    labels: jax.Array,
    *,
    eps: float = 1e-3,
    max_iter: int = 100,
    threshold: float = 1e-1,
    reduction: str = "mean",
    valid: jax.Array | None = None,
) -> jax.Array:
    """Entropy-regularized OT distance between prediction rows and label rows.

    Faithful to the reference's (unusual) geometry: the B prediction vectors and
    B label vectors are treated as two point clouds of B points in R^L, with a
    single squared-L2 cost matrix C in R^{BxB} and uniform marginals. Log-domain
    Sinkhorn updates run until the u-increment drops below `threshold` or
    `max_iter` iterations — here as a `lax.while_loop` instead of a python loop.
    """
    p = _squeeze_last(output)
    y = labels.astype(jnp.float32)
    cost = jnp.sum(jnp.abs(p[:, None, :] - y[None, :, :]) ** 2, axis=-1)  # (B, B)
    n_pts = cost.shape[0]
    if valid is None:
        mu = jnp.full((n_pts,), 1.0 / n_pts)
        nu = mu
    else:
        # padded rows get (near-)zero marginal mass so they transport nothing;
        # real rows keep uniform mass over the true row count — identical to
        # running the reference on the unpadded batch.
        w = valid.astype(jnp.float32)
        mu = w / jnp.maximum(jnp.sum(w), 1.0)
        nu = mu

    def modified_cost(u, v):
        return (-cost + u[:, None] + v[None, :]) / eps

    # Fixed-length scan with convergence freezing: identical fixed point to
    # the reference's early-exit python loop, but reverse-differentiable
    # (lax.while_loop has no VJP) and a single static XLA program.
    def body(state, _):
        u, v, done = state
        u_new = eps * (jnp.log(mu + 1e-8) - jax.nn.logsumexp(modified_cost(u, v), axis=-1)) + u
        v_new = eps * (
            jnp.log(nu + 1e-8) - jax.nn.logsumexp(modified_cost(u_new, v).T, axis=-1)
        ) + v
        err = jnp.sum(jnp.abs(u_new - u))
        u_out = jnp.where(done, u, u_new)
        v_out = jnp.where(done, v, v_new)
        return (u_out, v_out, done | (err < threshold)), None

    u0 = jnp.zeros((n_pts,))
    v0 = jnp.zeros((n_pts,))
    (u, v, _), _ = jax.lax.scan(body, (u0, v0, jnp.asarray(False)), None,
                                length=max_iter)
    pi = jnp.exp(modified_cost(u, v))
    del reduction  # kept for reference API parity; the cost is already a scalar
    return jnp.sum(pi * cost)


# ---------------------------------------------------------------------------
# Loss registry (the criterion dispatch of run.py:59-102)
# ---------------------------------------------------------------------------

LOSSES: dict[str, Callable] = {
    "bicut": bicut_loss,
    "choopy": choopy_loss,
    "attncut": attncut_loss,
    "div": div_loss,
    "rerank": rerank_loss,
    "bce": bce_loss,
    "mtcut": mtcut_loss,
    "wass": wass_dist_loss,
}


def make_loss(name: str, **kwargs) -> Callable:
    """Return `loss(output, labels, valid=None) -> scalar` configured with kwargs."""
    fn = LOSSES[name]
    return functools.partial(fn, **kwargs)
