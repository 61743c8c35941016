"""Selection-depth protocol for the MMOECut margin (VERDICT r4 ask #1).

The reference's headline per-model numbers are MAXIMA over each model's own
hyper-parameter random-search history (run.py:349-364 writes one line per
trial to parameters.log; the conf comments record the best —
hyper_parameter_drmm_tks.conf:52 mmoecut 0.810445 vs :42 attncut 0.7835).
Fixed-hparam paired comparisons on the hard profile show a tie (RESULTS.json:
mmoecut 0.7731 vs attncut 0.7738), so the last testable attribution of the
reference's +2.7pt margin is SELECTION DEPTH: max-over-search inflates
between-model spread relative to any fixed-hparam comparison, and may do so
asymmetrically if one architecture's search landscape has a fatter right
tail.

This script reproduces the reference's own search protocol per model:

* per run seed, the corpus is FIXED (generated from the run seed exactly as
  Trainer does) and SHARED by every trial and by both models (robust04: both
  read the 3-feature attncut family — a paired design);
* K trials draw (dropout, weight_decay) from the reference's regularizer
  distributions dropout~U(0.05, 0.5), wd~U(0.001, 0.02) (run.py:353-356) via
  train.draw_search_trials — the exact rng chain the sequential search uses —
  so both models see the SAME trial list at a given seed;
* one extra member trains at the preset conf hparams (the fixed-hparam
  anchor, config.py presets == hyper_parameter_drmm_tks.conf values);
* each trial gets its own init/dropout rng chain (member seed = run_seed*1000
  + 1 + trial), mirroring the reference where every trial's nn.Module draws
  fresh init from the ambient torch rng;
* all K+1 trials train as ONE vmapped population program
  (rlt_tpu/population.py), chunked for HBM.

Writes per-trial best_f1, per-(model, seed) search-max, and the running
max-over-first-k curve (the spread-vs-K view) to --out.

Usage:
  python scripts/selection_depth.py                      # hard profile
  python scripts/selection_depth.py --retrieve-data mq2007 \
      --dataset-name drmm_tks --out RESULTS_selection_depth_mq2007.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.data import synthetic_dataset  # noqa: E402
from rlt_tpu.data.datasets import synthetic_config  # noqa: E402
from rlt_tpu.population import Member, train_population  # noqa: E402
from rlt_tpu.train import draw_search_trials  # noqa: E402


def run_one(model: str, run_seed: int, args) -> dict:
    cfg = config_lib.apply_preset(config_lib.TrainConfig(
        model_name=model, retrieve_data=args.retrieve_data,
        dataset_name=args.dataset_name, epochs=args.epochs, seed=run_seed,
        regularizer_search=True, search_times=args.trials,
        log_dir="/tmp/rlt_tpu_seldepth_runs",
    ))
    corpus = synthetic_dataset(
        num_queries=cfg.synthetic_queries, seq_len=cfg.seq_len,
        num_features=cfg.input_size, seed=run_seed,
        **synthetic_config(cfg.retrieve_data, cfg.dataset_name),
    )
    trials = draw_search_trials(cfg)
    members = [Member(seed=run_seed * 1000)]  # preset-hparam anchor
    members += [
        Member(seed=run_seed * 1000 + 1 + i, dropout=t["dropout"],
               weight_decay=t["weight_decay"])
        for i, t in enumerate(trials)
    ]
    start = time.time()
    out = train_population(cfg, members, data=corpus,
                           chunk_size=args.chunk or None)
    wall = round(time.time() - start, 1)
    rows = out["per_member"]
    anchor, trial_rows = rows[0], rows[1:]
    f1s = [r["best_f1"] for r in trial_rows]
    running = np.maximum.accumulate(np.asarray(f1s)).tolist()
    best_i = int(np.argmax(f1s))
    return {
        "model": model, "seed": run_seed, "wall_s": wall,
        "preset_anchor": {
            "dropout": cfg.dropout, "weight_decay": cfg.weight_decay,
            "best_f1": anchor["best_f1"], "best_dcg": anchor["best_dcg"],
        },
        "trials": [
            {"dropout": t["dropout"], "weight_decay": t["weight_decay"],
             "best_f1": r["best_f1"], "best_dcg": r["best_dcg"]}
            for t, r in zip(trials, trial_rows)
        ],
        "search_max_f1": float(np.max(f1s)),
        "search_max_trial": {"index": best_i, **trials[best_i]},
        "running_max_f1": running,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", type=str, default="mmoecut,attncut")
    p.add_argument("--seeds", type=str, default="0,1,2")
    p.add_argument("--trials", type=int, default=32,
                   help="K search trials per (model, seed)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--chunk", type=int, default=8,
                   help="population HBM chunk (0 = unchunked)")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks_hard")
    p.add_argument("--out", type=str, default="RESULTS_selection_depth.json")
    args = p.parse_args()

    models = args.models.split(",")
    seeds = [int(s) for s in args.seeds.split(",")]
    results: dict = {
        "protocol": {
            "trials": args.trials, "epochs": args.epochs, "seeds": seeds,
            "retrieve_data": args.retrieve_data,
            "dataset_name": args.dataset_name,
            "distributions": "dropout~U(0.05,0.5), wd~U(0.001,0.02) "
                             "(reference run.py:353-356)",
        },
        "runs": [],
    }
    for model in models:
        for seed in seeds:
            row = run_one(model, seed, args)
            results["runs"].append(row)
            print(json.dumps({k: row[k] for k in
                              ("model", "seed", "search_max_f1", "wall_s")}
                             | {"preset_f1": row["preset_anchor"]["best_f1"]}),
                  flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    # summary: per-model mean search-max and the paired per-seed deltas
    summary: dict = {}
    for model in models:
        rows = [r for r in results["runs"] if r["model"] == model]
        summary[model] = {
            "search_max_per_seed": [r["search_max_f1"] for r in rows],
            "search_max_mean": float(np.mean([r["search_max_f1"] for r in rows])),
            "preset_per_seed": [r["preset_anchor"]["best_f1"] for r in rows],
            "preset_mean": float(np.mean(
                [r["preset_anchor"]["best_f1"] for r in rows])),
        }
    if len(models) == 2:
        a, b = models
        deltas = [x - y for x, y in zip(summary[a]["search_max_per_seed"],
                                        summary[b]["search_max_per_seed"])]
        summary["paired_search_max_delta"] = {
            "pair": f"{a} - {b}", "per_seed": deltas,
            "mean": float(np.mean(deltas)),
            "t": float(np.mean(deltas) / (np.std(deltas, ddof=1)
                                          / np.sqrt(len(deltas))))
            if len(deltas) > 1 and np.std(deltas, ddof=1) > 0 else None,
        }
    results["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
