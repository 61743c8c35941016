"""Truncation analysis toolkit (reference Baseline/Truncation_analysis.ipynb).

The reference's analysis notebook studies: (1) reward-curve shape — F1/DCG as
a function of k (cells 5-9); (2) retrieval bias — the proportion of irrelevant
documents in each prefix (cells 14-21); (3) probing convergence — AUC/DCG of
probes on raw features vs learned representations (cells 22-27, data from
verify_probe logs); (4) the augmented-reward transform exp(r/tau) vs exp(r)
(cells 38-41). All computations here are vectorized over the whole dataset;
figures are optional (gated matplotlib)."""

from __future__ import annotations

import numpy as np

from rlt_tpu.utils import metrics as metrics_lib


def mean_reward_curve(labels: np.ndarray, metric: str = "f1") -> np.ndarray:
    """Dataset-mean metric-at-k curve, (L,) (Truncation_analysis cells 5-9)."""
    return np.asarray(metrics_lib.reward_matrix(np.asarray(labels), metric)).mean(axis=0)


def irrelevant_proportion_curve(labels: np.ndarray) -> np.ndarray:
    """Mean proportion of irrelevant docs in the k-prefix for every k, (L,)
    (retrieval-bias analysis, cells 14-21)."""
    labels = np.asarray(labels, dtype=np.float64)
    k = np.arange(1, labels.shape[1] + 1)
    cum_irr = np.cumsum(1.0 - labels, axis=1)
    return (cum_irr / k).mean(axis=0)


def augmented_reward_transform(rewards: np.ndarray, tau: float = 0.35) -> np.ndarray:
    """Row-normalized exp(r/tau) — the reward sharpening whose effect the
    notebook visualizes against exp(r) (cells 38-41)."""
    z = np.asarray(rewards, dtype=np.float64) / tau
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def probing_convergence(curves: "np.ndarray | list") -> dict:
    """Summarize verify_probe per-step probe metrics: curves is (epochs,
    steps, 6) as returned by ProbeTrainer.run(). Returns final / best values
    per probe (cells 22-27 plot these trajectories)."""
    arr = np.asarray(curves)  # (E, S, 6)
    flat = arr.reshape(-1, arr.shape[-1])
    names = ("pre_encoding_classification", "pre_encoding_rerank",
             "expert0_classification", "expert0_rerank",
             "expert1_classification", "expert1_rerank")
    return {
        name: {"final": float(flat[-1, i]), "best": float(flat[:, i].max())}
        for i, name in enumerate(names)
    }


def plot_reward_curves(labels: np.ndarray, out_path: str = "./figs/reward_curves.png"):
    """F1/DCG-vs-k figure (Truncation_analysis cells 5-9). Returns the path or
    None when matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    f1 = mean_reward_curve(labels, "f1")
    dcg = mean_reward_curve(labels, "dcg")
    x = np.arange(1, f1.shape[0] + 1)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4), dpi=120)
    ax1.plot(x, f1)
    ax1.set_title("mean F1 @ k")
    ax1.set_xlabel("k")
    ax2.plot(x, dcg)
    ax2.set_title("mean DCG @ k")
    ax2.set_xlabel("k")
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
