"""Dataset construction: pkl ingestion + synthetic generator.

Ingestion reproduces the reference loaders byte-for-byte in semantics:

* attncut family (reference dataloader/attncut_dataloader.py:21-59): scores from
  `<base>/<retrieve_data>/<dataset>_{train,test}.pkl` (qid -> ordered dict
  doc_id -> score), per-position stat features from `attncut/<dataset>_*.pkl`,
  relevance from `gt.pkl` (qid -> relevant doc ids); X = column_stack((scores,
  stats)) per query, y = binary membership of each doc in gt.
* choopy family (choopy_dataloader.py:13-76): scores only, X = (N, L, 1).
* mtcut family (mtcut_dataloader.py:13-90): like attncut with stats from the
  `mtcut/` subdirectory (the 47-feature mq2007 variant).
* bicut family: run.py:61-62 routes bicut through the attncut loader (the lazy
  per-query loader bicut_dataloader.py is deprecated); we do the same.

The synthetic generator replaces the gitignored robust04 pickles (reference
.gitignore:7-9) with a deterministic fixture matching their statistics: ~250
queries, length-300 lists, ~45 relevant docs per query concentrated toward the
top (retrieval-quality-dependent), score curves that decay with rank, and stat
features correlated with relevance so models can actually learn.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np


@dataclasses.dataclass
class RankedListData:
    """Whole-dataset arrays (tiny: <=250 queries), host-side numpy."""

    x_train: np.ndarray  # (N_train, L, F) float32
    y_train: np.ndarray  # (N_train, L) float32 binary relevance
    x_test: np.ndarray   # (N_test, L, F)
    y_test: np.ndarray   # (N_test, L)

    @property
    def seq_len(self) -> int:
        return self.x_train.shape[1]

    @property
    def num_features(self) -> int:
        return self.x_train.shape[2]


def dataset_feature_dim(model_name: str, retrieve_data: str) -> int:
    """Feature width per model family (reference run.py:60, :70, :86).

    Delegates to the single table in TrainConfig.input_size so the two can
    never drift."""
    from rlt_tpu.config import TrainConfig

    return TrainConfig(model_name=model_name,
                       retrieve_data=retrieve_data).input_size


# ---------------------------------------------------------------------------
# pkl ingestion
# ---------------------------------------------------------------------------

def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def _relevance_labels(doc_scores: dict, rel_set: set) -> np.ndarray:
    """Binary gt-membership labels in ranked order (attncut_dataloader.py:50,
    bicut_dataloader.py:25)."""
    return np.asarray(
        [1.0 if doc in rel_set else 0.0 for doc in doc_scores.keys()],
        dtype=np.float32,
    )


def _join_split(scores_raw: dict, stats: dict | None, gt: dict):
    """Replicates the per-query join of attncut_dataloader.py:42-57."""
    xs, ys = [], []
    for qid, doc_scores in scores_raw.items():
        scores = np.asarray(list(doc_scores.values()), dtype=np.float32)
        is_rel = _relevance_labels(doc_scores, gt[qid])
        if stats is not None:
            feat = np.column_stack((scores, np.asarray(stats[qid], dtype=np.float32)))
        else:
            feat = scores[:, None]
        xs.append(feat)
        ys.append(is_rel)
    return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)


def load_pkl_dataset(
    base: str,
    retrieve_data: str = "robust04",
    dataset_name: str = "drmm_tks",
    family: str = "attncut",
) -> RankedListData:
    """Load a reference-format pickle dataset.

    family: 'attncut' | 'bicut' (stats from attncut/), 'mtcut' (stats from
    mtcut/), 'choopy' | 'mtchoopy' (scores only).
    """
    db = os.path.join(base, retrieve_data)
    gt = {k: set(v) for k, v in _load_pickle(os.path.join(db, "gt.pkl")).items()}
    train_raw = _load_pickle(os.path.join(db, f"{dataset_name}_train.pkl"))
    test_raw = _load_pickle(os.path.join(db, f"{dataset_name}_test.pkl"))

    stats_dir = {"attncut": "attncut", "bicut": "attncut", "mtcut": "mtcut"}.get(family)
    if stats_dir is not None:
        stats_train = _load_pickle(os.path.join(db, stats_dir, f"{dataset_name}_train.pkl"))
        stats_test = _load_pickle(os.path.join(db, stats_dir, f"{dataset_name}_test.pkl"))
    else:
        stats_train = stats_test = None

    x_train, y_train = _join_split(train_raw, stats_train, gt)
    x_test, y_test = _join_split(test_raw, stats_test, gt)
    return RankedListData(x_train, y_train, x_test, y_test)


def load_bicut_lazy(
    base: str,
    retrieve_data: str = "robust04",
    dataset_name: str = "drmm_tks",
) -> RankedListData:
    """Ingest the reference's per-query bicut layout
    (bicut_dataloader.py:10-29): `<base>/<retrieve_data>/bicut/<ds>_<stage>/`
    holds one pkl per qid with that query's (L, F) feature matrix; labels are
    rederived per query as gt-membership of the ranked doc ids from
    `<ds>_<stage>.pkl` (Rank_Dataset.__getitem__ :21-26).

    The reference streams these lazily through DataLoader workers because its
    bicut features are 231449-dim dense tf-idf; here the result is stacked
    into one device-ready array (the loader exists for layout parity — the
    trainer routes bicut through the attncut family, run.py:61-62).
    """
    db = os.path.join(base, retrieve_data)
    gt = {k: set(v) for k, v in _load_pickle(os.path.join(db, "gt.pkl")).items()}

    def load_stage(stage: str):
        stage_dir = os.path.join(db, "bicut", f"{dataset_name}_{stage}")
        raw = _load_pickle(os.path.join(db, f"{dataset_name}_{stage}.pkl"))
        xs, ys = [], []
        fnames = sorted(f for f in os.listdir(stage_dir) if f.endswith(".pkl"))
        if not fnames:
            raise ValueError(f"no per-query pkl files in {stage_dir}")
        for fname in fnames:
            qid = fname[: -len(".pkl")]  # qids may themselves contain dots
            feat = np.asarray(_load_pickle(os.path.join(stage_dir, fname)),
                              dtype=np.float32)
            xs.append(feat)
            ys.append(_relevance_labels(raw[qid], gt[qid]))
        return np.stack(xs), np.stack(ys)

    x_train, y_train = load_stage("train")
    x_test, y_test = load_stage("test")
    return RankedListData(x_train, y_train, x_test, y_test)


# ---------------------------------------------------------------------------
# Synthetic fixture
# ---------------------------------------------------------------------------

# retrieval_quality calibrated so synthetic oracle F1 matches the reference's
# per-ranker oracle (Baseline/Oracle.ipynb cell 10/13):
#   robust04: BM25 0.4413, DRMM 0.4398, DRMM-TKS 0.8547 (L=300, ~45 rel/query)
#   mq2007:   BM25 0.6169, DRMM-TKS 0.8877           (L=40, ~8 rel/query)
SYNTHETIC_QUALITY = {
    "robust04": {"bm25": 3.2, "drmm": 3.2, "drmm_tks": 19.5},
    "mq2007": {"bm25": 4.0, "drmm": 4.0, "drmm_tks": 13.8},
}
SYNTHETIC_MEAN_RELEVANT = {"robust04": 45.0, "mq2007": 8.0}


def synthetic_quality(dataset_name: str, retrieve_data: str = "robust04") -> float:
    table = SYNTHETIC_QUALITY.get(retrieve_data, SYNTHETIC_QUALITY["robust04"])
    return table.get(dataset_name, table["drmm_tks"])


def synthetic_config(retrieve_data: str, dataset_name: str) -> dict:
    """kwargs for synthetic_dataset matching the corpus statistics."""
    return {
        "retrieval_quality": synthetic_quality(dataset_name, retrieve_data),
        "mean_relevant": SYNTHETIC_MEAN_RELEVANT.get(retrieve_data, 45.0),
    }

def synthetic_dataset(
    num_queries: int = 250,
    seq_len: int = 300,
    num_features: int = 3,
    retrieval_quality: float = 2.5,
    mean_relevant: float = 45.0,
    train_fraction: float = 0.8,
    seed: int = 0,
) -> RankedListData:
    """Deterministic synthetic ranked lists with robust04-like statistics.

    Each query draws ~Poisson(mean_relevant) relevant docs placed with
    probability proportional to exp(-quality * rank / L) — higher quality
    concentrates relevance at the top (DRMM-TKS-like, oracle F1 ~0.85); low
    quality spreads it out (BM25-like, oracle F1 ~0.45). Features: channel 0 is
    a decaying noisy retrieval score; channels 1+ are noisy relevance-correlated
    similarity statistics (standing in for the tf-idf / doc2vec neighbor
    cosine-similarity features of data_prep/document_statics.ipynb cells 44-57).
    """
    rng = np.random.default_rng(seed)
    n = num_queries
    ranks = np.arange(seq_len, dtype=np.float32)

    # relevance placement
    place_logits = -retrieval_quality * ranks / seq_len
    place_p = np.exp(place_logits)
    y = np.zeros((n, seq_len), dtype=np.float32)
    for i in range(n):
        k = max(1, int(rng.poisson(mean_relevant)))
        k = min(k, seq_len)
        probs = place_p / place_p.sum()
        idx = rng.choice(seq_len, size=k, replace=False, p=probs)
        y[i, idx] = 1.0

    # retrieval score: decays with rank, relevant docs get a bump, plus noise
    base_score = np.exp(-3.0 * ranks / seq_len)[None, :]
    score = base_score + 0.25 * y + 0.08 * rng.standard_normal((n, seq_len))
    score = score.astype(np.float32)

    feats = [score]
    for c in range(1, num_features):
        w = 0.5 / c  # later channels are weaker signals
        stat = w * y + 0.15 * rng.standard_normal((n, seq_len))
        # neighbor-smoothed, like the reference's neighbor cosine sims
        stat = 0.5 * stat + 0.25 * np.roll(stat, 1, axis=1) + 0.25 * np.roll(stat, -1, axis=1)
        feats.append(stat.astype(np.float32))
    x = np.stack(feats, axis=-1)  # (N, L, F)

    n_train = int(round(train_fraction * n))
    perm = rng.permutation(n)
    tr, te = perm[:n_train], perm[n_train:]
    return RankedListData(x[tr], y[tr], x[te], y[te])
