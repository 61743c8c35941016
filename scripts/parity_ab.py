"""A/B parity experiment: reference torch implementation vs rlt_tpu on the
SAME synthetic dataset.

Imports the reference's own modules from /root/reference (read-only; nothing
is copied into this repo), points its loader at a generated reference-layout
dataset, trains with its exact recipe (model ctor, DivLoss, torch Adam,
decode), and trains rlt_tpu with the identical config. Reports best / best-5
test F1+DCG for both sides. Run on CPU:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      PYTHONPATH=/root/repo python scripts/parity_ab.py --epochs 30
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

import numpy as np


def make_dataset(tmp: str, seed: int = 0, num_queries: int = 250):
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.data.datasets import synthetic_quality
    from rlt_tpu.data.prep import write_reference_layout

    data = synthetic_dataset(
        num_queries=num_queries, seq_len=300, num_features=3, seed=seed,
        retrieval_quality=synthetic_quality("drmm_tks"),
    )

    # express the arrays in the reference's on-disk layout: per-query ordered
    # doc->score dicts, stat features, gt sets
    def to_layout(x, y, prefix):
        ranked, stats, gt = {}, {}, {}
        for i in range(x.shape[0]):
            qid = f"{prefix}{i}"
            docs = [f"{qid}_d{j}" for j in range(x.shape[1])]
            ranked[qid] = dict(zip(docs, x[i, :, 0].tolist()))
            stats[qid] = x[i, :, 1:]
            gt[qid] = {d for d, rel in zip(docs, y[i]) if rel == 1.0}
        return ranked, stats, gt

    import os
    import pickle

    db = f"{tmp}/robust04"
    os.makedirs(f"{db}/attncut", exist_ok=True)
    merged_gt = {}
    for split, (x, y) in (("train", (data.x_train, data.y_train)),
                          ("test", (data.x_test, data.y_test))):
        ranked, stats, gt = to_layout(x, y, split)
        merged_gt.update({q: sorted(v) for q, v in gt.items()})
        with open(f"{db}/drmm_tks_{split}.pkl", "wb") as f:
            pickle.dump(ranked, f)
        with open(f"{db}/attncut/drmm_tks_{split}.pkl", "wb") as f:
            pickle.dump({q: np.asarray(s).tolist() for q, s in stats.items()}, f)
    with open(f"{db}/gt.pkl", "wb") as f:
        pickle.dump(merged_gt, f)
    return data


def train_reference(tmp: str, epochs: int, lr: float, dropout: float,
                    weight_decay: float, batch_size: int, seed: int = 0,
                    model_name: str = "attncut"):
    """Train the reference model with its own modules (run.py recipe)."""
    import torch as t

    t.manual_seed(seed)
    # the reference imports numpy.lib.financial (removed in numpy>=1.20);
    # stub the module so its code runs unmodified
    import types

    fin = types.ModuleType("numpy.lib.financial")
    fin.irr = lambda *a, **k: None
    sys.modules.setdefault("numpy.lib.financial", fin)
    sys.path.insert(0, "/root/reference")
    import dataloader.attncut_dataloader as adl
    from models import AttnCut
    from utils import losses as ref_losses
    from utils.metrics import Metric

    adl.DATASET_BASE = tmp  # reference hardcodes a lab path (run.py:22)
    train_loader, test_loader, _ = adl.dataloader("robust04", "drmm_tks", batch_size)

    if model_name == "mmoecut":
        from models import MMOECut

        model = MMOECut(seq_len=300, num_tasks=3, input_size=3,
                        dropout=dropout, num_experts=3)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    else:
        model = AttnCut(input_size=3, dropout=dropout)
        criterion = ref_losses.DivLoss(metric="dcg", div_type="js", augmented=True)
    optimizer = t.optim.Adam(model.parameters(), lr=lr, weight_decay=weight_decay)

    f1_rec, dcg_rec = [], []
    for epoch in range(epochs):
        model.train()
        for X, y in train_loader:
            optimizer.zero_grad()
            loss = criterion(model(X), y)
            loss.backward()
            optimizer.step()
        model.eval()
        f1s, dcgs = [], []
        with t.no_grad():
            for X, y in test_loader:
                raw = model(X)
                out = (raw[-1] if model_name == "mmoecut" else raw)
                out = out.detach().squeeze().numpy()
                ks = np.argmax(out, axis=1) + 1
                yn = y.numpy()
                f1s.append(Metric.f1(yn, ks))
                dcgs.append(Metric.dcg(yn, ks))
        f1_rec.append(float(np.mean(f1s)))
        dcg_rec.append(float(np.mean(dcgs)))
        print(f"[torch] epoch {epoch}: test f1={f1_rec[-1]:.5f} dcg={dcg_rec[-1]:.5f}",
              flush=True)
    return {
        "best_f1": max(f1_rec), "best_dcg": max(dcg_rec),
        "best5_f1": float(np.mean(sorted(f1_rec, reverse=True)[:5])),
        "best5_dcg": float(np.mean(sorted(dcg_rec, reverse=True)[:5])),
    }


def train_ours(data, epochs: int, lr: float, dropout: float,
               weight_decay: float, batch_size: int, seed: int = 0,
               model_name: str = "attncut"):
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.train import Trainer

    cfg = TrainConfig(
        model_name=model_name, dataset_name="drmm_tks", epochs=epochs, lr=lr,
        dropout=dropout, weight_decay=weight_decay, batch_size=batch_size,
        seed=seed, log_dir="/tmp/rlt_tpu_parity_runs",
    )
    return Trainer(cfg, data=data).run()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="attncut",
                   help="attncut | mmoecut")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--weight-decay", type=float, default=0.0014756345581373493)
    p.add_argument("--batch-size", type=int, default=63)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="PARITY_AB.json")
    args = p.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        data = make_dataset(tmp, seed=args.seed)
        ours = train_ours(data, args.epochs, args.lr, args.dropout,
                          args.weight_decay, args.batch_size, args.seed,
                          model_name=args.model)
        ref = train_reference(tmp, args.epochs, args.lr, args.dropout,
                              args.weight_decay, args.batch_size, args.seed,
                              model_name=args.model)
    result = {"reference_torch": ref, "rlt_tpu": ours,
              "config": {k: getattr(args, k) for k in
                         ("model", "epochs", "lr", "dropout", "weight_decay",
                          "batch_size", "seed")}}
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
