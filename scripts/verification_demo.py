"""Run the two scientific-verification harnesses at full scale and record the
evidence (reference verify_BMT.py / verify_probe.py + Truncation_analysis
probing-convergence cells):

1. Aux-task learnability (verify_bmt): train a TaskC/TaskR head on raw
   features vs on a trained AttnCut's frozen trunk — the trunk representation
   should beat raw features (the premise of multi-task truncation).
2. Representation probing (verify_probe): train a 2-expert ProbeBase, then
   probe pre-encoding + per-expert representations with classification and
   rerank towers.

Writes VERIFICATION.json. Run with the TPU env (compiles are cached).
"""

from __future__ import annotations

import json

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu.analysis import probing_convergence  # noqa: E402
from rlt_tpu.config import TrainConfig, apply_preset  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402
from rlt_tpu.verify_bmt import run_verification  # noqa: E402
from rlt_tpu.verify_probe import ProbeTrainer  # noqa: E402

OUT = "VERIFICATION.json"


def _flush(results):
    """Rewrite the record after every stage so a late failure (probe phase,
    tunnel drop) cannot discard hours of earlier results."""
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def main():
    results = {}

    # 0. train the trunk checkpoint (attncut, published hyper-parameters)
    cfg = apply_preset(TrainConfig(model_name="attncut", epochs=100,
                                   model_persist=True, save_path="/tmp/rlt_best",
                                   log_dir="/tmp/rlt_verify_runs"))
    results["trunk_train"] = Trainer(cfg).run()
    _flush(results)

    # 1. aux-task learnability: raw features vs frozen trunk (20 epochs each)
    for verify_type, name in (("c", "classification_auc"), ("r", "rerank_dcg")):
        for ft in (False, True):
            vcfg = TrainConfig(
                model_name="attncut", batch_size=20, epochs=20, lr=3e-5,
                weight_decay=0.0015, dropout=0.1,
                model_path="/tmp/rlt_best/attncut" if ft else None,
                log_dir="/tmp/rlt_verify_runs",
            )
            record = run_verification(vcfg, verify_type=verify_type, ft=ft)
            key = f"bmt_{name}_{'frozen_trunk' if ft else 'raw_features'}"
            results[key] = {"final": record[-1], "best": max(record)}
            print(key, results[key], flush=True)
            _flush(results)

    # 2. representation probing (base 20 epochs, probes 60 epochs)
    pcfg = TrainConfig(model_name="probe_base", batch_size=20, lr=1e-5,
                       weight_decay=0.005, dropout=0.1,
                       save_path="/tmp/rlt_best", log_dir="/tmp/rlt_verify_runs")
    trainer = ProbeTrainer(pcfg, epochs_base=20, epochs_probe=60)
    curves = trainer.run(ft=False)
    results["probing"] = probing_convergence(curves)
    results["probe_base_best_f1"] = trainer.best_test_f1
    print("probing", json.dumps(results["probing"]), flush=True)
    _flush(results)


if __name__ == "__main__":
    main()
