"""A/B the population engine against sequential training on the same seeds.

The reference runs multi-seed evidence and hyper-parameter search as a python
loop of full trainings (run.py:349-364). At these model sizes each run leaves
the chip mostly idle (whole-model MFU 6-13%, RESULTS.md "Speed-of-light
accounting"), so K sequential runs cost ~K x one run. The population path
(rlt_tpu/population.py) trains the K members as ONE vmapped program whose
matmuls are K x fatter — this script measures what that buys on real
hardware.

Timing methodology: both sides use the scanned multi-epoch program (one
dispatch per scan block), the only dispatch pattern that times honestly
through the tunneled TPU (RESULTS.md "Timing methodology"). The population
side is run twice — the first (cold) wall includes XLA compile, the second
(warm) hits the persistent compilation cache — and the sequential side once
(its first seed compiles, the rest reuse the cache; per-seed walls are
reported so the compile epoch is visible).

Usage:
  python scripts/bench_population.py --model attncut --k 8 --epochs 100 \
      [--dataset-name drmm_tks_hard] [--out RESULTS_population.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.population import Member, train_population  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="attncut")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks")
    p.add_argument("--k", type=int, default=8, help="population size / seeds 0..k-1")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--no-pallas", action="store_true",
                   help="vmapped pallas kernels serialize their grids over "
                        "members; XLA-scan recurrences batch members into "
                        "one fat chain instead — A/B this")
    p.add_argument("--chunk", type=int, default=None,
                   help="members per vmapped program (HBM capacity valve; "
                        "population.train_population chunk_size)")
    p.add_argument("--skip-sequential", action="store_true",
                   help="population timings only (sequential side already "
                        "recorded elsewhere)")
    p.add_argument("--out", type=str, default="RESULTS_population.json")
    args = p.parse_args()

    cfg = config_lib.apply_preset(config_lib.TrainConfig(
        model_name=args.model, retrieve_data=args.retrieve_data,
        dataset_name=args.dataset_name, epochs=args.epochs,
        use_pallas=not args.no_pallas,
        log_dir="/tmp/rlt_tpu_pop_bench",
    ))
    members = [Member(seed=s) for s in range(args.k)]

    t0 = time.time()
    out_cold = train_population(cfg, members, chunk_size=args.chunk)
    pop_cold = time.time() - t0
    t0 = time.time()
    out_warm = train_population(cfg, members, chunk_size=args.chunk)
    pop_warm = time.time() - t0

    result = {
        "model": args.model, "dataset_name": args.dataset_name,
        "k": args.k, "epochs": args.epochs, "chunk": args.chunk,
        "use_pallas": not args.no_pallas,
        "pop_cold_wall_s": round(pop_cold, 2),
        "pop_warm_wall_s": round(pop_warm, 2),
        "per_member": out_warm["per_member"],
        "mean_best_f1": sum(r["best_f1"] for r in out_warm["per_member"]) / args.k,
        "cold_equals_warm": all(
            abs(c["best_f1"] - w["best_f1"]) < 1e-6
            for c, w in zip(out_cold["per_member"], out_warm["per_member"])),
    }

    if not args.skip_sequential:
        seq_walls, seq_rows = [], []
        for s in range(args.k):
            t0 = time.time()
            summary = Trainer(dataclasses.replace(cfg, seed=s)).run()
            seq_walls.append(round(time.time() - t0, 2))
            seq_rows.append({k: summary[k] for k in
                             ("best_f1", "best_dcg", "best5_f1", "best5_dcg")})
        result["seq_wall_s"] = round(sum(seq_walls), 2)
        result["seq_per_seed_wall_s"] = seq_walls
        result["seq_per_seed"] = seq_rows
        result["speedup_warm"] = round(sum(seq_walls) / pop_warm, 2)
        result["speedup_cold"] = round(sum(seq_walls) / pop_cold, 2)
        result["max_member_f1_delta"] = max(
            abs(a["best_f1"] - b["best_f1"])
            for a, b in zip(out_warm["per_member"], seq_rows))

    print(json.dumps(result, indent=2), flush=True)
    # merge into the out-file keyed by configuration, so the K x model grid
    # accumulates in one artifact
    try:
        with open(args.out) as f:
            merged = json.load(f)
        if "model" in merged:  # legacy single-run layout
            merged = {f"{merged['model']}_{merged['dataset_name']}"
                      f"_k{merged['k']}": merged}
    except (FileNotFoundError, json.JSONDecodeError):
        merged = {}
    tag = "" if not args.no_pallas else "_nopallas"
    merged[f"{args.model}_{args.dataset_name}_k{args.k}{tag}"] = result
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
