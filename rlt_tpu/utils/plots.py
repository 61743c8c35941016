"""Reward-distribution figures (reference run.py:242-298).

The reference compares the batch-averaged normalized reward distribution
exp(r/tau) against the model's averaged predicted cut distribution and saves a
figure per (model, div, augmented, epoch). The reward matrix there is an
O(B*L) python loop of Metric_for_Loss calls; here it is the vectorized
reward curve. matplotlib is optional (gated import)."""

from __future__ import annotations

import os

import numpy as np

from rlt_tpu.utils import metrics as metrics_lib


def reward_and_prediction_curves(
    labels: np.ndarray, predictions: np.ndarray, metric: str = "f1",
    tau: float = 0.9,
):
    """Batch-mean normalized reward dist + batch-mean normalized prediction
    dist, each (L,) — the vectorized equivalent of run.py:263-283."""
    r = np.asarray(metrics_lib.reward_matrix(labels, metric))
    r = np.exp(r / tau)
    norm_r = (r / r.sum(axis=1, keepdims=True)).mean(axis=0)

    z = predictions / (tau * 1e-3)
    z = z - z.max(axis=1, keepdims=True)  # shift-invariant, avoids exp overflow
    s = np.exp(z)
    norm_s = (s / s.sum(axis=1, keepdims=True)).mean(axis=0)
    if norm_s.shape[0] > 4:  # run.py:283 flattens the tail artifacts
        norm_s[-3:] = norm_s[-4]
    return norm_r, norm_s


def plot_reward_vs_prediction(
    labels: np.ndarray, predictions: np.ndarray, *, metric: str, epoch: int,
    model_name: str, div_type: str, aug_reward: bool, out_dir: str = "./figs",
) -> str | None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    norm_r, norm_s = reward_and_prediction_curves(labels, predictions, metric)
    os.makedirs(out_dir, exist_ok=True)
    x = np.arange(1, norm_r.shape[0] + 1)
    plt.figure(figsize=(10, 5), dpi=120)
    plt.grid(linestyle="--")
    plt.plot(x, norm_r, color="limegreen", linewidth=3.0, label="Truncation Reward")
    plt.plot(x, norm_s, color="mediumslateblue", linewidth=3.0,
             label="Truncation Probability")
    plt.legend(fontsize=15)
    plt.title("Distribution of truncation reward and model prediction",
              fontsize=18, fontweight="bold")
    plt.xlabel("position", fontsize=18, fontweight="bold")
    path = os.path.join(
        out_dir,
        f"{model_name}_{div_type}_{'ar' if aug_reward else 'dr'}_{epoch}.png",
    )
    plt.savefig(path)
    plt.close()
    return path
