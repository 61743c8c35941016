"""Measure the bf16 compute path: epoch time and convergence vs float32.

`TrainConfig.compute_dtype='bfloat16'` casts params + inputs to bf16 inside
the loss (master weights stay fp32, losses/metrics stay fp32 — train.py:146).
The MXU runs bf16 matmuls at 2x the f32 rate, so the XLA matmuls (LSTM
input projections, qkv/FFN, gates) should speed up; the Pallas kernels
accept bf16 operands but accumulate in f32 VMEM, so their time is flat.

Prints per-(model, dtype): steady-state epoch ms (bench.py chained-scan
methodology) + best F1 over --epochs of real training, so any bf16
convergence regression is visible next to the speedup. Writes
RESULTS_bf16.json.

Usage: python scripts/bench_bf16.py [--models mmoecut,attncut,choopy]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402

from bench import time_epochs  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", type=str, default="mmoecut,attncut,choopy")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", type=str, default="RESULTS_bf16.json")
    args = p.parse_args(argv)

    records = []
    for model in args.models.split(","):
        for dtype in ("float32", "bfloat16"):
            cfg = config_lib.apply_preset(config_lib.TrainConfig(
                model_name=model, dataset_name="drmm_tks",
                log_dir="/tmp/rlt_tpu_bf16_runs", epochs=args.epochs,
            ))
            cfg = dataclasses.replace(cfg, compute_dtype=dtype)
            trainer = Trainer(cfg)
            per_epoch, compile_s = time_epochs(trainer, k_long=21)
            summary = Trainer(cfg).run()
            rec = {
                "model": model, "compute_dtype": dtype,
                "epoch_ms": round(per_epoch * 1e3, 3),
                "compile_s": round(compile_s, 2),
                "best_f1": summary["best_f1"],
                "best5_f1": summary["best5_f1"],
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
