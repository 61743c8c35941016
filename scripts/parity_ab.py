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


def make_dataset(tmp: str, seed: int = 0, num_queries: int = 250,
                 retrieve_data: str = "robust04", num_features: int = 3,
                 dataset_name: str = "drmm_tks"):
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.data.datasets import synthetic_config
    from rlt_tpu.data.prep import write_reference_layout

    seq_len = 300 if retrieve_data == "robust04" else 40
    data = synthetic_dataset(
        num_queries=num_queries, seq_len=seq_len, num_features=num_features,
        seed=seed, **synthetic_config(retrieve_data, dataset_name),
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

    db = f"{tmp}/{retrieve_data}"
    # stat features live under attncut/ for at_dataloader and mtcut/ for
    # mc_dataloader (run.py:85-90 loader routing); write both so any model's
    # loader finds them
    for stats_dir in ("attncut", "mtcut"):
        os.makedirs(f"{db}/{stats_dir}", exist_ok=True)
    merged_gt = {}
    for split, (x, y) in (("train", (data.x_train, data.y_train)),
                          ("test", (data.x_test, data.y_test))):
        ranked, stats, gt = to_layout(x, y, split)
        merged_gt.update({q: sorted(v) for q, v in gt.items()})
        with open(f"{db}/{dataset_name}_{split}.pkl", "wb") as f:
            pickle.dump(ranked, f)
        for stats_dir in ("attncut", "mtcut"):
            with open(f"{db}/{stats_dir}/{dataset_name}_{split}.pkl", "wb") as f:
                pickle.dump({q: np.asarray(s).tolist() for q, s in stats.items()},
                            f)
    with open(f"{db}/gt.pkl", "wb") as f:
        pickle.dump(merged_gt, f)
    return data


def train_reference(tmp: str, epochs: int, lr: float, dropout: float,
                    weight_decay: float, batch_size: int, seed: int = 0,
                    model_name: str = "attncut", retrieve_data: str = "robust04",
                    num_features: int = 3, dataset_name: str = "drmm_tks"):
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
    seq_len = 300 if retrieve_data == "robust04" else 40
    # loader routing exactly as run.py:59-103: choopy family -> cp_dataloader,
    # mq2007 mmoe family -> mc_dataloader, everything else -> at_dataloader
    if model_name in ("choopy", "mtchoopy"):
        import dataloader.choopy_dataloader as cdl

        cdl.DATASET_BASE = tmp
        train_loader, test_loader, _ = cdl.dataloader(retrieve_data, dataset_name,
                                                      batch_size)
    elif (model_name in ("mmoecut", "moecut", "mtple")
            and retrieve_data != "robust04"):
        # run.py:87-90/:94/:100: mq2007 mmoe-family stats via mc_dataloader
        import dataloader.mtcut_dataloader as mdl

        mdl.DATASET_BASE = tmp
        train_loader, test_loader, _ = mdl.dataloader(retrieve_data, dataset_name,
                                                      batch_size)
    else:
        train_loader, test_loader, _ = adl.dataloader(retrieve_data, dataset_name,
                                                      batch_size)

    if model_name == "mmoecut":
        from models import MMOECut

        model = MMOECut(seq_len=seq_len, num_tasks=3, input_size=num_features,
                        dropout=dropout, num_experts=3)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    elif model_name == "choopy":
        # run.py:65-68: scores-only loader, Choopy + ChoopyLoss
        from models import Choopy

        model = Choopy(seq_len=seq_len, dropout=dropout)
        criterion = ref_losses.ChoopyLoss(metric="dcg")
    elif model_name == "bicut":
        # run.py:59-64: attncut loader routing, BiCut + BiCutLoss
        from models import BiCut

        model = BiCut(input_size=num_features, dropout=dropout)
        criterion = ref_losses.BiCutLoss(metric="dcg")  # run.py:64 w/ --criterion dcg
    elif model_name == "mtchoopy":
        # run.py:76-80: scores-only loader, MtCutLoss with conf weights (0.5/0.5)
        from models import MtChoopy

        model = MtChoopy(seq_len=seq_len, num_tasks=3, dropout=dropout)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    elif model_name == "mtattncut":
        # run.py:81-85: attncut loader, MtCutLoss with conf weights (0.5/0.5)
        from models import MtAttnCut

        model = MtAttnCut(input_size=num_features, num_tasks=3, dropout=dropout)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    elif model_name == "moecut":
        # run.py:92-97: MtCutLoss WITHOUT weights (torch defaults 0.5/0.5)
        from models import MOECut

        model = MOECut(seq_len=seq_len, num_tasks=3, input_size=num_features,
                       dropout=dropout)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    elif model_name == "mtple":
        # run.py:98-103: PLECut, MtCutLoss without weights
        from models import PLECut

        model = PLECut(seq_len=seq_len, input_size=num_features,
                       dropout=dropout, num_experts=3)
        criterion = ref_losses.MtCutLoss(metric="dcg", num_tasks=3)
    elif model_name == "attncut":
        model = AttnCut(input_size=num_features, dropout=dropout)
        criterion = ref_losses.DivLoss(metric="dcg", div_type="js", augmented=True)
    else:
        raise ValueError(f"no reference-side recipe for model {model_name!r}")
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
                if model_name == "bicut":
                    # run.py:131-136: all-continue -> k=L, else first truncate
                    preds = np.argmax(raw.detach().numpy(), axis=2)
                    ks = [p.shape[0] if p.sum() == p.shape[0]
                          else int(np.argmin(p)) + 1 for p in preds]
                else:
                    # run.py:137-142: multi-task models ('m' in name) decode
                    # the LAST head. Squeeze only the feature axis so a
                    # 1-row final batch keeps its batch dimension.
                    out = (raw[-1] if "m" in model_name else raw)
                    out = out.detach().numpy().squeeze(-1)
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
               model_name: str = "attncut", retrieve_data: str = "robust04",
               dataset_name: str = "drmm_tks"):
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.train import Trainer

    cfg = TrainConfig(
        model_name=model_name, dataset_name=dataset_name, epochs=epochs, lr=lr,
        dropout=dropout, weight_decay=weight_decay, batch_size=batch_size,
        seed=seed, log_dir="/tmp/rlt_tpu_parity_runs",
        retrieve_data=retrieve_data,
        # match the torch side exactly: train_reference builds MtCutLoss with
        # its ctor defaults 0.5/0.5 (reference losses.py:170) for every
        # multi-task model, which also equals the published conf weights for
        # mtchoopy/mtattncut; TrainConfig's argparse defaults are 0.3/0.4
        rerank_weight=0.5, class_weight=0.5,
    )
    if model_name in ("choopy", "mtchoopy"):  # scores-only (cp_dataloader)
        import dataclasses

        data = dataclasses.replace(
            data, x_train=data.x_train[..., :1], x_test=data.x_test[..., :1]
        )
    return Trainer(cfg, data=data).run()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="attncut",
                   help="attncut | mmoecut | choopy | bicut | mtchoopy | "
                        "mtattncut | moecut | mtple")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--weight-decay", type=float, default=0.0014756345581373493)
    p.add_argument("--batch-size", type=int, default=63)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--retrieve-data", type=str, default="robust04",
                   help="robust04 (L=300, F=3) | mq2007 (L=40, F=25/47)")
    p.add_argument("--dataset-name", type=str, default="drmm_tks",
                   help="drmm_tks | bm25 | drmm (selects the synthetic "
                        "calibration and the pkl file names)")
    p.add_argument("--out", type=str, default="PARITY_AB.json")
    args = p.parse_args()

    # feature width per corpus/model family (run.py:60, :70, :86)
    if args.retrieve_data == "robust04":
        num_features = 3
    elif args.model in ("mmoecut", "moecut", "mtple"):
        num_features = 47
    else:
        num_features = 25

    with tempfile.TemporaryDirectory() as tmp:
        data = make_dataset(tmp, seed=args.seed,
                            retrieve_data=args.retrieve_data,
                            num_features=num_features,
                            dataset_name=args.dataset_name)
        ours = train_ours(data, args.epochs, args.lr, args.dropout,
                          args.weight_decay, args.batch_size, args.seed,
                          model_name=args.model,
                          retrieve_data=args.retrieve_data,
                          dataset_name=args.dataset_name)
        ref = train_reference(tmp, args.epochs, args.lr, args.dropout,
                              args.weight_decay, args.batch_size, args.seed,
                              model_name=args.model,
                              retrieve_data=args.retrieve_data,
                              dataset_name=args.dataset_name,
                              num_features=num_features)
    result = {"reference_torch": ref, "rlt_tpu": ours,
              "config": {k: getattr(args, k) for k in
                         ("model", "epochs", "lr", "dropout", "weight_decay",
                          "batch_size", "seed", "retrieve_data",
                          "dataset_name")}}
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
