"""Calibrate the hard synthetic profile (SYNTHETIC_HARD_PROFILE knobs).

Trains chosen models over a few seeds at given knob values and prints the
per-model mean best F1, so the knobs can be dialed until AttnCut lands ~0.78
with ~7 points of headroom to the (unchanged) oracle — the spread the real
robust04 corpus shows (reference hyper_parameter_drmm_tks.conf:42 vs :52).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/calibrate_hard.py \
      --flip 0.3 --models attncut,mmoecut --seeds 0,1,2
"""

from __future__ import annotations

import argparse
import json

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.data import datasets  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flip", type=float, default=None)
    p.add_argument("--gain", type=float, default=None)
    p.add_argument("--subtypes", type=int, default=None)
    p.add_argument("--noise", type=float, default=None)
    p.add_argument("--models", type=str, default="attncut,mmoecut")
    p.add_argument("--seeds", type=str, default="0,1,2")
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()

    overrides = {k: v for k, v in [
        ("evidence_flip", args.flip), ("nuisance_gain", args.gain),
        ("subtypes", args.subtypes), ("noise_scale", args.noise),
    ] if v is not None}
    datasets.SYNTHETIC_HARD_PROFILE.update(overrides)
    print("profile:", json.dumps(datasets.SYNTHETIC_HARD_PROFILE))

    for name in args.models.split(","):
        f1s = []
        for seed in (int(s) for s in args.seeds.split(",")):
            cfg = config_lib.apply_preset(config_lib.TrainConfig(
                model_name=name, dataset_name="drmm_tks_hard",
                epochs=args.epochs, seed=seed,
                log_dir="/tmp/rlt_tpu_calib_runs",
            ))
            summary = Trainer(cfg).run()
            f1s.append(summary["best_f1"])
        mean = sum(f1s) / len(f1s)
        print(f"{name}: mean_best_f1={mean:.4f} "
              f"per_seed={[round(f, 4) for f in f1s]}", flush=True)


if __name__ == "__main__":
    main()
