"""Hypothesis-(a) probe: the MMOE margin on REAL-PIPELINE features.

Every MMOE-gap experiment so far (RESULTS.md "MMOE-gap probe") trained on
GAUSSIAN synthetic feature channels; the surviving attribution for the
reference's +2.7pt MMOECut margin (hyper_parameter_drmm_tks.conf:52 vs :42)
is "the real corpus's feature joint distribution — non-Gaussian,
cross-correlated, produced by tf-idf/doc2vec pipelines". This script tests
the PIPELINE half of that claim without the gitignored corpus: it
synthesizes topic-structured RAW DOCUMENTS, pushes them through the
framework's real feature pipeline — corpus tf-idf + neighbor cosine sims
(data/features.py, document_statics.ipynb cells 19-21/44-57) and PV-DBOW
doc2vec embeddings (data/doc2vec.py, Doc2Vec(200, min_count=2)) — and runs
the paired mmoecut-vs-attncut comparison on the resulting [score,
tfidf_sim, d2v_sim] features (the at_dataloader layout, run.py:60).

Generator (host numpy, deterministic per seed):
* vocab of V tokens; T topics, each concentrated on its own token slice
  over a shared Zipf background;
* per query: one topic; ~Poisson(mean_rel) relevant docs mixing
  lambda~U(lo,hi) topical tokens into background; irrelevant docs are
  background plus off-topic contamination, with a fraction drawn from a
  SIBLING topic (hard decoys whose tf-idf neighborhood looks topical);
* the ranked order is by a noisy topical-overlap retrieval score, so
  relevance placement (and the oracle ceiling) emerges from retrieval
  quality instead of being painted on.

If the expert/gate mechanism feeds on pipeline-feature structure, MMOECut
should open a gap here that Gaussian channels could not produce; if the
paired delta stays ~0, hypothesis (a) narrows to the real corpus's
LINGUISTIC statistics specifically (which no generator can counterfeit).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/pipeline_corpus_probe.py [--seeds 0,1,2] [--queries 120]
Writes RESULTS_pipeline_probe.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

import rlt_tpu

rlt_tpu.enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.data.datasets import RankedListData  # noqa: E402
from rlt_tpu.data.doc2vec import (doc2vec_embeddings_per_query,  # noqa: E402
                                  train_doc2vec)
from rlt_tpu.data.features import build_stat_features  # noqa: E402
from rlt_tpu.data.prep import split_dataset  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402
from rlt_tpu.utils import metrics as metrics_lib  # noqa: E402


def gen_raw_corpus(seed: int, num_queries: int, L: int = 300,
                   vocab_size: int = 3000, topics: int = 30,
                   rel_lo: float = 8.0, rel_hi: float = 110.0,
                   doc_len_mu: float = 4.0,
                   doc_len_sigma: float = 0.35, noise: float = 0.10,
                   decoy_frac: float = 0.15, flip_frac: float = 0.0,
                   decoy_lam_hi: float = 0.4):
    """-> (token_lists_per_query, scores (Q,L), y (Q,L))."""
    rng = np.random.default_rng(seed)
    # shared Zipf background over the vocabulary
    ranks = np.arange(1, vocab_size + 1)
    background = (1.0 / ranks) / np.sum(1.0 / ranks)
    slice_w = vocab_size // topics
    topic_tokens = [np.arange(t * slice_w, (t + 1) * slice_w)
                    for t in range(topics)]

    tlpq: dict[str, list[list[str]]] = {}
    scores = np.zeros((num_queries, L), np.float32)
    y = np.zeros((num_queries, L), np.float32)
    for q in range(num_queries):
        topic = int(rng.integers(topics))
        sibling = (topic + 1) % topics
        # WIDE per-query relevant-count spread (the reference's greedy-k
        # sits 23pt under oracle because no single k fits every query)
        n_rel = int(np.clip(rng.poisson(rng.uniform(rel_lo, rel_hi)),
                            5, L - 50))
        rel_flags = np.zeros(L, bool)
        rel_flags[:n_rel] = True

        docs, raw_scores = [], []
        for i in range(L):
            length = int(np.clip(rng.lognormal(doc_len_mu, doc_len_sigma),
                                 20, 300))
            if rel_flags[i]:
                # flip_frac of relevant docs carry (almost) NO topical
                # evidence — labels stay true, only the text lies (the
                # hard profile's evidence_flip, here at the raw-text level)
                lam = (rng.uniform(0.0, 0.05) if rng.uniform() < flip_frac
                       else rng.uniform(0.2, 0.6))
                src_topic = topic
            elif rng.uniform() < decoy_frac:
                lam = rng.uniform(0.15, decoy_lam_hi)  # sibling-topic decoy
                src_topic = sibling
            else:
                lam = rng.uniform(0.0, 0.08)   # background chatter
                src_topic = int(rng.integers(topics))
            n_top = int(round(lam * length))
            top = rng.choice(topic_tokens[src_topic], size=n_top)
            back = rng.choice(vocab_size, size=length - n_top, p=background)
            toks = np.concatenate([top, back])
            rng.shuffle(toks)
            docs.append([f"t{t}" for t in toks])
            # retrieval score: noisy TRUE-topic overlap (the retrieval model
            # sees through decoys only partially)
            overlap = lam if src_topic == topic else 0.35 * lam
            raw_scores.append(overlap + rng.normal(0.0, noise))
        order = np.argsort(-np.asarray(raw_scores), kind="stable")
        tlpq[str(q)] = [docs[i] for i in order]
        scores[q] = np.asarray(raw_scores, np.float32)[order]
        y[q] = rel_flags[order].astype(np.float32)
    return tlpq, scores, y


def build_features(tlpq, scores, d2v_epochs: int, seed: int):
    """Real-pipeline features: [score, tfidf_neighbor_sim, d2v_neighbor_sim]."""
    all_docs = [t for toks in tlpq.values() for t in toks]
    t0 = time.time()
    model = train_doc2vec(all_docs, vector_size=200, min_count=2,
                          epochs=d2v_epochs, batch_size=4096, seed=seed)
    d2v_s = time.time() - t0
    emb = doc2vec_embeddings_per_query(model, tlpq)  # positional lookup
    t1 = time.time()
    feats = build_stat_features(tlpq, embeddings_per_query=emb,
                                include_doc_stats=False)  # (L, 2) per qid
    tfidf_s = time.time() - t1
    x = np.stack([
        np.concatenate([scores[int(q)][:, None], feats[q]], axis=1)
        for q in tlpq
    ]).astype(np.float32)  # (Q, L, 3)
    return x, {"d2v_train_s": round(d2v_s, 1), "tfidf_s": round(tfidf_s, 1)}


def corpus_baselines(y):
    yj = jnp.asarray(y)
    return {
        "oracle_f1": float(metrics_lib.oracle_score(yj, "f1")),
        "greedy_f1": float(metrics_lib.fixed_k_score(
            yj, int(metrics_lib.greedy_k(yj, "f1")), "f1")),
        "fixed10_f1": float(metrics_lib.fixed_k_score(yj, 10, "f1")),
        "fixed50_f1": float(metrics_lib.fixed_k_score(yj, 50, "f1")),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=str, default="0,1,2")
    p.add_argument("--queries", type=int, default=120)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--d2v-epochs", type=int, default=20)
    p.add_argument("--models", type=str, default="mmoecut,attncut")
    p.add_argument("--gen-only", action="store_true",
                   help="calibrate: print corpus baselines and exit")
    p.add_argument("--hard", action="store_true",
                   help="adversarial variant: 12%% evidence-flipped relevant "
                        "docs, 35%% sibling decoys up to lam 0.55, noise "
                        "0.13 — caps trained models well below oracle")
    p.add_argument("--out", type=str, default="RESULTS_pipeline_probe.json")
    args = p.parse_args()

    results: dict = {"protocol": vars(args), "runs": []}
    models = args.models.split(",")
    for seed in [int(s) for s in args.seeds.split(",")]:
        t0 = time.time()
        hard_kw = (dict(flip_frac=0.12, decoy_frac=0.35, decoy_lam_hi=0.55,
                        noise=0.13) if args.hard else {})
        tlpq, scores, y = gen_raw_corpus(seed, args.queries, **hard_kw)
        base = corpus_baselines(y)
        print(json.dumps({"seed": seed, "gen_s": round(time.time() - t0, 1),
                          **base}), flush=True)
        if args.gen_only:
            results["runs"].append({"seed": seed, "baselines": base})
            continue
        x, pipe_meta = build_features(tlpq, scores, args.d2v_epochs, seed)
        tr_idx, te_idx = split_dataset(list(range(x.shape[0])), 0.8,
                                       seed=seed)
        data = RankedListData(x[tr_idx], y[tr_idx], x[te_idx], y[te_idx])
        row: dict = {"seed": seed, "baselines": base, "pipeline": pipe_meta}
        for model in models:
            cfg = config_lib.apply_preset(config_lib.TrainConfig(
                model_name=model, dataset_name="drmm_tks",
                epochs=args.epochs, seed=seed,
                synthetic_queries=args.queries,
                log_dir="/tmp/rlt_tpu_pipeline_probe"))
            t1 = time.time()
            summary = Trainer(cfg, data=data).run()
            row[model] = {
                "best_f1": float(summary["best_f1"]),
                "best5_f1": float(summary["best5_f1"]),
                "best_dcg": float(summary["best_dcg"]),
                "wall_s": round(time.time() - t1, 1),
            }
            print(json.dumps({"seed": seed, "model": model, **row[model]}),
                  flush=True)
        if len(models) == 2:
            row["paired_delta_f1"] = (row[models[0]]["best_f1"]
                                      - row[models[1]]["best_f1"])
        results["runs"].append(row)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    runs = [r for r in results["runs"] if "paired_delta_f1" in r]
    if runs:
        deltas = [r["paired_delta_f1"] for r in runs]
        results["summary"] = {
            "pair": f"{models[0]} - {models[1]}",
            "per_seed": deltas,
            "mean": float(np.mean(deltas)),
            "t": float(np.mean(deltas) / (np.std(deltas, ddof=1)
                                          / np.sqrt(len(deltas))))
            if len(deltas) > 1 and np.std(deltas, ddof=1) > 0 else None,
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
