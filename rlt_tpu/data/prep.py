"""Offline dataset preparation (reference data_prep/*.ipynb as a library).

The reference prepares datasets in notebooks: parse retrieval runs into
per-query top-L ranked lists (data_prepare.ipynb cells 13-16, 34-45), build
the ground-truth relevance map (cells 49-50), compute per-document statistical
features (document_statics.ipynb), and write 5-fold 80/20 train/test splits
(cells 12, 16, 45, 64-65). Here the same pipeline is pure functions over
in-memory structures, with `write_reference_layout` emitting the exact pkl
layout the reference loaders (and ours) read.

Semantics preserved (SURVEY §2.5): queries with fewer than `seq_len` retrieved
docs are DROPPED (not padded); queries with zero relevant docs in the top-L
are dropped; splits are random 80/20 with one seed per fold.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def run_from_trec_file(path: str) -> dict[str, dict[str, float]]:
    """Parse a standard TREC run file ('qid Q0 docid rank score tag' lines)
    into qid -> {doc_id: score}. The reference ingests retrieval runs from
    ad-hoc pickles (data_prepare.ipynb cells 13-16, 34-45); TREC format is the
    interoperable equivalent every IR toolkit emits."""
    run: dict[str, dict[str, float]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:  # the trailing run tag is optional
                continue
            qid, _, doc_id, _, score = parts[:5]
            run.setdefault(qid, {})[doc_id] = float(score)
    return run


def qrels_from_trec_file(path: str) -> dict[str, set]:
    """Parse TREC qrels ('qid 0 docid rel') into qid -> relevant-doc set
    (the reference builds gt.pkl from its own relevance pickles)."""
    gt: dict[str, set] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            qid, _, doc_id, rel = parts[:4]
            if int(rel) > 0:
                gt.setdefault(qid, set()).add(doc_id)
            else:
                gt.setdefault(qid, set())
    return gt


def ranked_lists_from_run(run: dict[str, dict[str, float]], seq_len: int = 300):
    """run: qid -> {doc_id: score} (any order) -> qid -> ordered dict of the
    top-seq_len docs by descending score. Queries with < seq_len docs are
    dropped (data_prepare.ipynb cells 14, 43, 63)."""
    out = {}
    for qid, doc_scores in run.items():
        if len(doc_scores) < seq_len:
            continue
        ranked = sorted(doc_scores.items(), key=lambda kv: -kv[1])[:seq_len]
        out[qid] = dict(ranked)
    return out


def filter_queries_with_relevance(ranked: dict, gt: dict[str, set]) -> dict:
    """Drop queries whose top-L list contains no relevant doc
    (data_prepare.ipynb cells 15, 44)."""
    out = {}
    for qid, docs in ranked.items():
        rel = gt.get(qid, set())
        if any(d in rel for d in docs):
            out[qid] = docs
    return out


def split_dataset(qids: list[str], train_fraction: float = 0.8, seed: int = 0):
    """One 80/20 random split (data_prepare.ipynb cell 12)."""
    rng = np.random.default_rng(seed)
    qids = list(qids)
    perm = rng.permutation(len(qids))
    n_train = int(round(train_fraction * len(qids)))
    train = [qids[i] for i in perm[:n_train]]
    test = [qids[i] for i in perm[n_train:]]
    return train, test


def five_fold_splits(qids: list[str], train_fraction: float = 0.8):
    """split_1..split_5 with distinct seeds (data_prepare.ipynb cells 16, 45,
    64-65)."""
    return {f"split_{i + 1}": split_dataset(qids, train_fraction, seed=i)
            for i in range(5)}


def write_reference_layout(
    base: str,
    retrieve_data: str,
    dataset_name: str,
    ranked: dict[str, dict[str, float]],
    gt: dict[str, set],
    stats: dict[str, np.ndarray] | None = None,
    train_fraction: float = 0.8,
    seed: int = 0,
) -> None:
    """Write <base>/<retrieve_data>/{<ds>_train,<ds>_test,gt}.pkl (+
    attncut/ and mtcut/ stat pkls) in the exact layout the loaders read
    (attncut_dataloader.py:30-40)."""
    db = os.path.join(base, retrieve_data)
    os.makedirs(db, exist_ok=True)
    train_q, test_q = split_dataset(list(ranked), train_fraction, seed)

    def dump(obj, *parts):
        path = os.path.join(db, *parts)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(obj, f)

    dump({q: ranked[q] for q in train_q}, f"{dataset_name}_train.pkl")
    dump({q: ranked[q] for q in test_q}, f"{dataset_name}_test.pkl")
    dump({q: sorted(gt.get(q, set())) for q in ranked}, "gt.pkl")
    if stats is not None:
        for sub in ("attncut", "mtcut"):
            dump({q: np.asarray(stats[q]).tolist() for q in train_q},
                 sub, f"{dataset_name}_train.pkl")
            dump({q: np.asarray(stats[q]).tolist() for q in test_q},
                 sub, f"{dataset_name}_test.pkl")


def write_bicut_layout(
    base: str,
    retrieve_data: str,
    dataset_name: str,
    ranked: dict[str, dict[str, float]],
    stats: dict[str, np.ndarray],
    train_fraction: float = 0.8,
    seed: int = 0,
) -> None:
    """Write the per-query bicut layout the lazy loader reads
    (split_bicut_data.py:13-46 semantics, bicut_dataloader.py:10-26 layout):
    `<base>/<retrieve_data>/bicut/<ds>_<stage>/<qid>.pkl`, each holding that
    query's (L, 1+S) matrix of column_stack((scores, dense stats)). Must be
    paired with `write_reference_layout` (same seed) for the score pkls and
    gt.pkl the loader also reads."""
    db = os.path.join(base, retrieve_data)
    train_q, test_q = split_dataset(list(ranked), train_fraction, seed)
    for stage, qids in (("train", train_q), ("test", test_q)):
        stage_dir = os.path.join(db, "bicut", f"{dataset_name}_{stage}")
        os.makedirs(stage_dir, exist_ok=True)
        for qid in qids:
            scores = np.asarray(list(ranked[qid].values()), dtype=np.float32)
            feat = np.column_stack((scores, np.asarray(stats[qid], np.float32)))
            with open(os.path.join(stage_dir, f"{qid}.pkl"), "wb") as f:
                pickle.dump(feat, f)


def main(argv=None):
    """CLI: TREC run + qrels -> reference-layout pkl dataset.

    python -m rlt_tpu.data.prep --run run.txt --qrels qrels.txt \
        --out dataset/ --dataset-name bm25 [--seq-len 300]
    """
    import argparse

    p = argparse.ArgumentParser(description="rlt_tpu dataset preparation")
    p.add_argument("--run", type=str, required=True, help="TREC run file")
    p.add_argument("--qrels", type=str, required=True, help="TREC qrels file")
    p.add_argument("--out", type=str, required=True, help="output dataset root")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="bm25")
    p.add_argument("--seq-len", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    run = run_from_trec_file(args.run)
    gt = qrels_from_trec_file(args.qrels)
    ranked, gt, _ = prepare_dataset(run, gt, seq_len=args.seq_len)
    write_reference_layout(args.out, args.retrieve_data, args.dataset_name,
                           ranked, gt, seed=args.seed)
    print(f"wrote {len(ranked)} queries to {args.out}/{args.retrieve_data}")


def prepare_dataset(
    run: dict[str, dict[str, float]],
    relevant: dict[str, set],
    token_lists: dict[str, list[list[str]]] | None = None,
    embeddings: dict[str, np.ndarray] | None = None,
    seq_len: int = 300,
    train_embeddings: bool = False,
    doc2vec_kwargs: dict | None = None,
):
    """Full pipeline: rank -> drop short/irrelevant queries -> stat features.

    With ``train_embeddings=True`` (and no precomputed ``embeddings``) a
    PV-DBOW doc2vec model is trained over the kept queries' token lists and
    its document vectors feed the d2v neighbor-sim feature — the complete
    document_statics.ipynb pipeline with no gensim. ``doc2vec_kwargs``
    overrides `train_doc2vec` defaults (vector_size=200, min_count=2,
    epochs=40).

    Returns (ranked, gt, stats|None) ready for write_reference_layout."""
    from rlt_tpu.data.features import build_stat_features

    ranked = ranked_lists_from_run(run, seq_len)
    ranked = filter_queries_with_relevance(ranked, relevant)
    stats = None
    if token_lists is not None:
        kept_tokens = {q: token_lists[q] for q in ranked}
        if embeddings is None and train_embeddings:
            from rlt_tpu.data.doc2vec import (
                doc2vec_embeddings_per_query,
                train_doc2vec,
            )

            corpus = [t for toks in kept_tokens.values() for t in toks]
            model = train_doc2vec(corpus, **(doc2vec_kwargs or {}))
            embeddings = doc2vec_embeddings_per_query(model, kept_tokens)
        stats = build_stat_features(
            kept_tokens,
            {q: embeddings[q] for q in ranked} if embeddings else None,
        )
    gt = {q: set(relevant.get(q, set())) for q in ranked}
    return ranked, gt, stats


if __name__ == "__main__":
    main()
