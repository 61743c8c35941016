"""Train every model to convergence and record best / best-5 F1 and DCG
(the reference's headline table, BASELINE.md). Writes RESULTS.json.

The DEFAULT corpus is the discriminative `drmm_tks_hard` profile at 5 seeds
— the framework's primary reported benchmark, because it reproduces the
reference's architecture ordering (recurrent < attention family, MMOECut
top; hyper_parameter_drmm_tks.conf:6-72 best-f1 comments). The original
calibrated corpus saturates near oracle (six models within 0.2%) and
cannot rank architectures; it remains the calibration/parity fixture:

  python scripts/convergence_sweep.py --dataset-name drmm_tks --seeds 0 \
      --out RESULTS_calibration.json

Usage: python scripts/convergence_sweep.py [--epochs 100] [--models a,b,...]
"""

from __future__ import annotations

import argparse
import json
import time

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402

ALL_MODELS = ["bicut", "choopy", "attncut", "mtchoopy", "mtattncut",
              "mmoecut", "moecut", "mtple"]


def run_folds(args):
    """split_1..N re-splits of one fixed corpus (5-fold reference protocol)."""
    import numpy as np

    from rlt_tpu.data import RankedListData, synthetic_dataset
    from rlt_tpu.data.datasets import synthetic_config

    results = {}
    for name in args.models.split(","):
        cfg0 = config_lib.apply_preset(config_lib.TrainConfig(
            model_name=name, retrieve_data=args.retrieve_data,
            dataset_name=args.dataset_name, epochs=args.epochs,
            log_dir="/tmp/rlt_tpu_sweep_runs",
        ))
        base = synthetic_dataset(
            num_queries=cfg0.synthetic_queries, seq_len=cfg0.seq_len,
            num_features=cfg0.input_size, seed=0, train_fraction=1.0,
            **synthetic_config(args.retrieve_data, args.dataset_name),
        )
        x = np.concatenate([base.x_train, base.x_test]) if base.x_test.size else base.x_train
        y = np.concatenate([base.y_train, base.y_test]) if base.y_test.size else base.y_train
        import dataclasses

        from rlt_tpu.data.prep import split_dataset

        per_fold = []
        for fold in range(args.folds):
            tr, te = split_dataset(list(range(x.shape[0])), 0.8, seed=fold)
            data = RankedListData(x[tr], y[tr], x[te], y[te])
            cfg = dataclasses.replace(cfg0, seed=fold)
            start = time.time()
            summary = Trainer(cfg, data=data).run()
            summary["fold"] = fold
            summary["wall_s"] = round(time.time() - start, 1)
            per_fold.append(summary)
        results[name] = {
            "per_fold": per_fold,
            "mean_best_f1": float(np.mean([s["best_f1"] for s in per_fold])),
            "std_best_f1": float(np.std([s["best_f1"] for s in per_fold])),
        }
        print(name, json.dumps(results[name]), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks_hard")
    p.add_argument("--models", type=str, default=",".join(ALL_MODELS))
    p.add_argument("--seeds", type=str, default="0,1,2,3,4",
                   help="comma-separated seeds (e.g. 0,1,2 for the 3-seed "
                        "MMOECut reproduction, SURVEY §7.8)")
    p.add_argument("--folds", type=int, default=0,
                   help="train across N 80/20 re-splits of ONE corpus (the "
                        "reference's split_1..5 protocol, data_prepare.ipynb)")
    p.add_argument("--population", type=int, default=0,
                   help="train all seeds of a model as ONE vmapped program "
                        "(rlt_tpu/population.py) instead of sequentially")
    p.add_argument("--out", type=str, default="RESULTS.json")
    args = p.parse_args()

    if args.folds:
        run_folds(args)
        return

    seeds = [int(s) for s in args.seeds.split(",")]
    results = {}
    for name in args.models.split(","):
        per_seed = []
        if args.population:
            from rlt_tpu.population import Member, train_population

            cfg = config_lib.apply_preset(config_lib.TrainConfig(
                model_name=name, retrieve_data=args.retrieve_data,
                dataset_name=args.dataset_name, epochs=args.epochs,
                log_dir="/tmp/rlt_tpu_sweep_runs",
            ))
            start = time.time()
            out = train_population(cfg, [Member(seed=s) for s in seeds])
            wall = round(time.time() - start, 1)
            for seed, row in zip(seeds, out["per_member"]):
                per_seed.append({
                    k: row[k]
                    for k in ("best_f1", "best_dcg", "best5_f1", "best5_dcg")
                } | {"seed": seed, "population_wall_s": wall})
        else:
            for seed in seeds:
                cfg = config_lib.apply_preset(config_lib.TrainConfig(
                    model_name=name, retrieve_data=args.retrieve_data,
                    dataset_name=args.dataset_name, epochs=args.epochs,
                    seed=seed, log_dir="/tmp/rlt_tpu_sweep_runs",
                ))
                start = time.time()
                summary = Trainer(cfg).run()
                summary["wall_s"] = round(time.time() - start, 1)
                summary["seed"] = seed
                per_seed.append(summary)
        if len(per_seed) == 1:
            results[name] = per_seed[0]
        else:
            results[name] = {
                "per_seed": per_seed,
                "mean_best_f1": sum(s["best_f1"] for s in per_seed) / len(per_seed),
                "mean_best5_f1": sum(s["best5_f1"] for s in per_seed) / len(per_seed),
            }
        print(name, json.dumps(results[name]), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
