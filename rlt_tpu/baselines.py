"""Classical truncation baselines (reference Baseline/*.ipynb -> one CLI).

Fixed-k: metric at a fixed cut (Fixed_k.ipynb cell 4/12). Greedy-k: the single
k maximizing the mean train curve, applied to test (Greedy_k.ipynb cell 6).
Oracle: per-query best k on test — the upper bound (Oracle.ipynb cell 6).
All three read off the same (B, L) metric-curve tensor the losses use, so the
whole baseline table is three jitted reductions instead of notebook loops."""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp

from rlt_tpu.config import TrainConfig
from rlt_tpu.data import load_pkl_dataset, synthetic_dataset
from rlt_tpu.data.datasets import synthetic_config
from rlt_tpu.utils import metrics as metrics_lib


def baseline_table(y_train, y_test, fixed_ks=(5, 10, 50)) -> dict:
    """All classical baselines for one dataset, as one dict."""
    y_train = jnp.asarray(y_train)
    y_test = jnp.asarray(y_test)
    out: dict = {}
    for metric in ("f1", "dcg"):
        curve_test = metrics_lib.reward_matrix(y_test, metric)
        out[f"oracle_{metric}"] = float(jnp.mean(jnp.max(curve_test, axis=-1)))
        k = int(metrics_lib.greedy_k(y_train, metric))
        out[f"greedy_k_{metric}"] = k
        out[f"greedy_{metric}"] = float(metrics_lib.fixed_k_score(y_test, k, metric))
        for fk in fixed_ks:
            out[f"fixed_{metric}@{fk}"] = float(
                metrics_lib.fixed_k_score(y_test, fk, metric))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="rlt_tpu classical baselines")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks")
    p.add_argument("--dataset-base", type=str, default=None)
    p.add_argument("--fixed-ks", type=int, nargs="+", default=[5, 10, 50])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.dataset_base:
        data = load_pkl_dataset(args.dataset_base, args.retrieve_data,
                                args.dataset_name, "choopy")
    else:
        cfg = TrainConfig(retrieve_data=args.retrieve_data,
                          dataset_name=args.dataset_name)
        data = synthetic_dataset(seq_len=cfg.seq_len, seed=args.seed,
                                 **synthetic_config(args.retrieve_data, args.dataset_name))
    table = baseline_table(data.y_train, data.y_test, tuple(args.fixed_ks))
    print(json.dumps(table, indent=2))
    return table


if __name__ == "__main__":
    main()
