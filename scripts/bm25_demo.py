"""Can the framework learn the low-signal bm25 regime?

The published conf hparams fail here for BOTH implementations (torch 0.048 /
rlt_tpu 0.067, PARITY_AB_bm25_attncut.json) — matching the reference's own
blank best-f1 comments in hyper_parameter_bm25.conf. This script answers the
follow-up: is the regime information-limited, or just mis-tuned? It grids
lr x dropout at a longer budget and reports every run against the corpus's
fixed-k floor (greedy, trained-on-train) and oracle ceiling.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bm25_demo.py

Writes RESULTS_bm25_demo.json.
"""

from __future__ import annotations

import dataclasses
import json

import rlt_tpu

rlt_tpu.enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.data import synthetic_dataset  # noqa: E402
from rlt_tpu.data.datasets import synthetic_config  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402
from rlt_tpu.utils import metrics  # noqa: E402


def main():
    base_cfg = config_lib.TrainConfig(model_name="attncut",
                                      dataset_name="bm25", epochs=200,
                                      log_dir="/tmp/rlt_tpu_bm25_runs")
    data = synthetic_dataset(
        num_queries=base_cfg.synthetic_queries, seq_len=base_cfg.seq_len,
        num_features=base_cfg.input_size, seed=0,
        **synthetic_config("robust04", "bm25"))
    rw_tr = metrics.reward_matrix(jnp.asarray(data.y_train), "f1")
    rw_te = metrics.reward_matrix(jnp.asarray(data.y_test), "f1")
    oracle = float(jnp.mean(jnp.max(rw_te, axis=1)))
    k_greedy = int(jnp.argmax(jnp.mean(rw_tr, axis=0)))
    greedy = float(jnp.mean(rw_te[:, k_greedy]))
    print(f"oracle={oracle:.4f} greedy(k={k_greedy + 1})={greedy:.4f}",
          flush=True)

    runs = []
    for model in ("attncut", "mmoecut"):
        for lr in (3e-5, 3e-4, 1e-3):
            for dropout in (0.0, 0.1):
                cfg = dataclasses.replace(base_cfg, model_name=model,
                                          lr=lr, dropout=dropout)
                summary = Trainer(cfg).run()
                rec = {"model": model, "lr": lr, "dropout": dropout,
                       "best_f1": summary["best_f1"],
                       "best5_f1": summary["best5_f1"],
                       "beats_greedy": summary["best_f1"] > greedy}
                runs.append(rec)
                print(json.dumps(rec), flush=True)

    out = {"oracle_f1": oracle, "greedy_f1": greedy,
           "greedy_k": k_greedy + 1, "epochs": base_cfg.epochs, "runs": runs,
           "best": max(runs, key=lambda r: r["best_f1"])}
    with open("RESULTS_bm25_demo.json", "w") as f:
        json.dump(out, f, indent=2)
    print("best:", json.dumps(out["best"]))


if __name__ == "__main__":
    main()
