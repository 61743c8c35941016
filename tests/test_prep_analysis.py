"""Tests for the offline prep pipeline (§2.6) and the analysis toolkit (§2.7)."""

import numpy as np

from rlt_tpu.analysis import (
    augmented_reward_transform,
    irrelevant_proportion_curve,
    mean_reward_curve,
    probing_convergence,
)
from rlt_tpu.data import load_pkl_dataset
from rlt_tpu.data.prep import (
    filter_queries_with_relevance,
    five_fold_splits,
    prepare_dataset,
    ranked_lists_from_run,
    split_dataset,
    write_reference_layout,
)
from rlt_tpu.utils.batchnorm import batch_norm


def _toy_run(n_q=8, n_docs=12):
    rng = np.random.default_rng(0)
    run, rel = {}, {}
    for qi in range(n_q):
        qid = f"q{qi}"
        docs = {f"{qid}_d{j}": float(rng.random()) for j in range(n_docs)}
        run[qid] = docs
        rel[qid] = {d for d in docs if rng.random() < 0.4}
    return run, rel


def test_ranked_lists_sorted_and_truncated():
    run, _ = _toy_run()
    ranked = ranked_lists_from_run(run, seq_len=10)
    for qid, docs in ranked.items():
        scores = list(docs.values())
        assert len(scores) == 10
        assert scores == sorted(scores, reverse=True)


def test_short_and_irrelevant_queries_dropped():
    run, rel = _toy_run()
    run["short"] = {"d0": 1.0}  # < seq_len -> dropped
    rel["short"] = {"d0"}
    ranked = ranked_lists_from_run(run, seq_len=10)
    assert "short" not in ranked
    rel["q0"] = set()  # no relevant docs -> dropped
    kept = filter_queries_with_relevance(ranked, {k: set(v) for k, v in rel.items()})
    assert "q0" not in kept


def test_splits_disjoint_and_seeded():
    qids = [f"q{i}" for i in range(10)]
    tr, te = split_dataset(qids, 0.8, seed=0)
    assert len(tr) == 8 and len(te) == 2
    assert set(tr) | set(te) == set(qids) and not set(tr) & set(te)
    folds = five_fold_splits(qids)
    assert len(folds) == 5
    assert folds["split_1"] != folds["split_2"]


def test_end_to_end_prep_roundtrip(tmp_path):
    run, rel = _toy_run(n_q=10, n_docs=10)
    ranked, gt, _ = prepare_dataset(run, rel, seq_len=10)
    write_reference_layout(str(tmp_path), "robust04", "bm25", ranked, gt)
    data = load_pkl_dataset(str(tmp_path), "robust04", "bm25", family="choopy")
    assert data.x_train.shape[1:] == (10, 1)
    assert data.x_train.shape[0] + data.x_test.shape[0] == len(ranked)


def test_bicut_layout_roundtrip(tmp_path):
    """write_bicut_layout -> load_bicut_lazy reproduces the per-qid layout of
    bicut_dataloader.py (features = column_stack((scores, stats)), labels
    rederived from gt membership)."""
    from rlt_tpu.data.datasets import load_bicut_lazy
    from rlt_tpu.data.prep import write_bicut_layout

    rng = np.random.default_rng(0)
    run, rel = _toy_run(n_q=6, n_docs=8)
    ranked, gt, _ = prepare_dataset(run, rel, seq_len=8)
    stats = {q: rng.standard_normal((8, 2)).astype(np.float32) for q in ranked}
    write_reference_layout(str(tmp_path), "robust04", "bm25", ranked, gt, seed=3)
    write_bicut_layout(str(tmp_path), "robust04", "bm25", ranked, stats, seed=3)

    data = load_bicut_lazy(str(tmp_path), "robust04", "bm25")
    assert data.x_train.shape[1:] == (8, 3)
    assert data.x_train.shape[0] + data.x_test.shape[0] == len(ranked)
    # same split seed -> same qids; verify one feature row and its label
    eager = load_pkl_dataset(str(tmp_path), "robust04", "bm25", family="choopy")
    np.testing.assert_allclose(
        np.sort(data.x_train[:, :, 0].ravel()),
        np.sort(eager.x_train[:, :, 0].ravel()), rtol=1e-6)
    assert set(np.unique(data.y_train)) <= {0.0, 1.0}
    np.testing.assert_array_equal(np.sort(data.y_test.sum(1)),
                                  np.sort(eager.y_test.sum(1)))


def test_prepare_dataset_trains_doc2vec_features(tmp_path):
    """train_embeddings=True -> the 4th stat column (d2v neighbor sim) is
    produced by the in-framework PV-DBOW model (document_statics.ipynb)."""
    rng = np.random.default_rng(0)
    run, rel = _toy_run(n_q=4, n_docs=6)
    vocab = [f"w{i}" for i in range(20)]
    token_lists = {
        qid: [list(rng.choice(vocab, size=12)) for _ in range(6)] for qid in run
    }
    ranked, gt, stats = prepare_dataset(
        run, rel, token_lists=token_lists, seq_len=6,
        train_embeddings=True,
        doc2vec_kwargs=dict(vector_size=8, min_count=1, epochs=2),
    )
    for qid in ranked:
        assert stats[qid].shape == (6, 4)  # len, uniq, tfidf_sim, d2v_sim
        assert np.isfinite(stats[qid]).all()
        assert (np.abs(stats[qid][:, 3]) <= 1.0 + 1e-5).all()


def test_reward_and_bias_curves():
    labels = np.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], np.float32)
    f1 = mean_reward_curve(labels, "f1")
    assert f1.shape == (4,)
    bias = irrelevant_proportion_curve(labels)
    assert bias[0] == 0.0  # both first docs relevant
    assert bias[-1] == np.mean([2 / 4, 3 / 4])


def test_augmented_reward_is_distribution():
    r = np.asarray([[0.1, 0.5, 0.9]])
    q = augmented_reward_transform(r, tau=0.35)
    np.testing.assert_allclose(q.sum(axis=-1), 1.0, atol=1e-9)
    assert q[0, 2] > q[0, 0]  # sharpened toward the max


def test_probing_convergence_summary():
    curves = np.random.default_rng(0).random((2, 3, 6))
    out = probing_convergence(curves)
    assert len(out) == 6
    for v in out.values():
        assert v["best"] >= v["final"] - 1e-12


def test_batch_norm_normalizes_channels():
    x = np.random.default_rng(0).normal(3.0, 2.0, (8, 5, 3)).astype(np.float32)
    z = np.asarray(batch_norm(x))
    np.testing.assert_allclose(z.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(z.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_trec_run_and_qrels_parsing(tmp_path):
    from rlt_tpu.data.prep import qrels_from_trec_file, run_from_trec_file

    run_file = tmp_path / "run.txt"
    run_file.write_text(
        "301 Q0 docA 1 12.5 bm25\n"
        "301 Q0 docB 2 11.0 bm25\n"
        "302 Q0 docC 1 9.9 bm25\n"
        "bad line\n"
    )
    run = run_from_trec_file(str(run_file))
    assert run["301"] == {"docA": 12.5, "docB": 11.0}
    assert run["302"] == {"docC": 9.9}

    qrels = tmp_path / "qrels.txt"
    qrels.write_text("301 0 docA 1\n301 0 docB 0\n302 0 docC 2\n")
    gt = qrels_from_trec_file(str(qrels))
    assert gt["301"] == {"docA"} and gt["302"] == {"docC"}


def test_prep_cli_trec_to_dataset(tmp_path):
    import numpy as np

    from rlt_tpu.data import load_pkl_dataset
    from rlt_tpu.data.prep import main as prep_main

    rng = np.random.default_rng(0)
    run_lines, qrel_lines = [], []
    for qi in range(6):
        qid = f"q{qi}"
        for j in range(12):
            doc = f"{qid}_d{j}"
            run_lines.append(f"{qid} Q0 {doc} {j+1} {float(12-j)} t")
            qrel_lines.append(f"{qid} 0 {doc} {int(rng.random() < 0.4)}")
    (tmp_path / "run.txt").write_text("\n".join(run_lines))
    (tmp_path / "qrels.txt").write_text("\n".join(qrel_lines))
    out = tmp_path / "dataset"
    prep_main(["--run", str(tmp_path / "run.txt"),
               "--qrels", str(tmp_path / "qrels.txt"),
               "--out", str(out), "--seq-len", "10"])
    data = load_pkl_dataset(str(out), "robust04", "bm25", family="choopy")
    assert data.x_train.shape[1:] == (10, 1)


def test_trec_to_training_end_to_end(tmp_path):
    """Full user workflow: TREC run/qrels -> prep CLI -> pkl dataset ->
    Trainer on the loaded data (choopy family: scores only)."""
    import numpy as np

    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import load_pkl_dataset
    from rlt_tpu.data.prep import main as prep_main
    from rlt_tpu.train import Trainer

    rng = np.random.default_rng(1)
    run_lines, qrel_lines = [], []
    for qi in range(20):
        qid = f"q{qi}"
        for j in range(12):
            doc = f"{qid}_d{j}"
            run_lines.append(f"{qid} Q0 {doc} {j+1} {float(12-j)+rng.random()} t")
            qrel_lines.append(f"{qid} 0 {doc} {int(rng.random() < 0.4)}")
    (tmp_path / "run.txt").write_text("\n".join(run_lines))
    (tmp_path / "qrels.txt").write_text("\n".join(qrel_lines))
    out = tmp_path / "dataset"
    prep_main(["--run", str(tmp_path / "run.txt"),
               "--qrels", str(tmp_path / "qrels.txt"),
               "--out", str(out), "--seq-len", "12"])

    data = load_pkl_dataset(str(out), "robust04", "bm25", family="choopy")
    cfg = TrainConfig(
        model_name="choopy", dataset_name="bm25", seq_len_override=12,
        batch_size=8, epochs=2, use_pallas=False,
        log_dir="/tmp/rlt_tpu_test_runs",
    )
    summary = Trainer(cfg, data=data).run()
    assert np.isfinite(summary["best_f1"])


def test_bicut_layout_dotted_qids_and_empty_stage(tmp_path):
    from rlt_tpu.data.datasets import load_bicut_lazy
    from rlt_tpu.data.prep import write_bicut_layout

    rng = np.random.default_rng(0)
    # TREC qids may contain dots (e.g. '10.2'); parsing must keep them intact
    ranked = {f"10.{i}": {f"d{i}_{j}": float(10 - j) for j in range(4)}
              for i in range(5)}
    gt = {q: {list(ranked[q])[0]} for q in ranked}
    stats = {q: rng.standard_normal((4, 2)).astype(np.float32) for q in ranked}
    write_reference_layout(str(tmp_path), "robust04", "bm25", ranked, gt, seed=0)
    write_bicut_layout(str(tmp_path), "robust04", "bm25", ranked, stats, seed=0)
    data = load_bicut_lazy(str(tmp_path), "robust04", "bm25")
    assert data.x_train.shape[0] + data.x_test.shape[0] == 5
    assert (data.y_train.sum(1) == 1).all()  # exactly the gt doc per query

    # an emptied stage dir fails with an explicit message, not a stack error
    import shutil
    test_dir = tmp_path / "robust04" / "bicut" / "bm25_test"
    shutil.rmtree(test_dir)
    test_dir.mkdir()
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no per-query pkl"):
        load_bicut_lazy(str(tmp_path), "robust04", "bm25")


# ---------------------------------------------------------------------------
# The reference's actual raw formats (data_prepare.ipynb cells 34-45, 56-65)
# ---------------------------------------------------------------------------

def _raw_bm25_query(qid, n_docs, relevant_ranks, score0=10.0):
    docs = [{"doc_id": f"{qid}_d{r}", "rank": r + 1,
             "bm25_score": score0 - 0.01 * r,
             "norm_bm25_score": 5.0 - 0.01 * r,
             "is_relevant": r in relevant_ranks}
            for r in range(n_docs)]
    return {"query_id": qid, "query_text": f"query {qid}",
            "relevant_documents": [d["doc_id"] for d in docs if d["is_relevant"]],
            "num_rel": len(relevant_ranks), "retrieved_documents": docs,
            "num_ret": n_docs, "num_rel_ret": len(relevant_ranks)}


def test_bm25_raw_pickles_to_dataset(tmp_path):
    """End-to-end over the reference's raw run-pickle shape: split pickles
    concatenated, short lists dropped, truncation to seq_len, no-relevant
    queries dropped, and the result loads through load_pkl_dataset."""
    import pickle

    from rlt_tpu.data.prep import (
        bm25_queries_to_ranked,
        load_bm25_run_pickles,
    )

    qs = {
        "train": [_raw_bm25_query("301", 12, {0, 3}),
                  _raw_bm25_query("302", 5, {1})],      # too short: dropped
        "dev": [_raw_bm25_query("303", 10, set()),       # no relevant: dropped
                _raw_bm25_query("304", 15, {2})],
        "test": [_raw_bm25_query("305", 10, {9})],
    }
    paths = []
    for stage, queries in qs.items():
        path = tmp_path / f"rob04_bm25_top1000.{stage}.s1.pkl"
        with open(path, "wb") as f:
            pickle.dump({"queries": queries}, f)
        paths.append(str(path))

    queries = load_bm25_run_pickles(paths)
    assert [q["query_id"] for q in queries] == ["301", "302", "303", "304", "305"]
    ranked, gt = bm25_queries_to_ranked(queries, seq_len=10)
    assert sorted(ranked) == ["301", "304", "305"]
    assert all(len(docs) == 10 for docs in ranked.values())
    # retrieved order is preserved, not re-sorted
    assert list(ranked["301"]) == [f"301_d{r}" for r in range(10)]
    assert gt["301"] == {"301_d0", "301_d3"}

    out = tmp_path / "ds"
    write_reference_layout(str(out), "robust04", "bm25", ranked, gt)
    data = load_pkl_dataset(str(out), "robust04", "bm25", family="choopy")
    assert data.x_train.shape[1] == 10
    assert data.x_train.shape[0] + data.x_test.shape[0] == 3


def test_matchzoo_results_to_ranked():
    """The matchzoo result-dataframe shape: rows shuffled across queries,
    ranked per query by descending relation_score, short queries dropped."""
    import pandas as pd

    from rlt_tpu.data.prep import matchzoo_results_to_ranked

    rows = []
    for qid, n in (("301", 6), ("302", 3)):
        for j in range(n):
            rows.append({"id_left": qid, "id_right": f"{qid}_d{j}",
                         "relation_score": float(j)})  # ascending on purpose
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=0)  # shuffle rows
    ranked = matchzoo_results_to_ranked(df, seq_len=5)
    assert list(ranked) == ["301"]  # 302 has < 5 rows
    # descending relation_score order
    assert list(ranked["301"]) == [f"301_d{j}" for j in (5, 4, 3, 2, 1)]
    assert list(ranked["301"].values()) == [5.0, 4.0, 3.0, 2.0, 1.0]


def test_reference_split_dataset_bit_for_bit():
    """reference_split_dataset must reproduce the notebook's stdlib-RNG
    shrinking-list sampling exactly (data_prepare.ipynb cell 64)."""
    import random

    from rlt_tpu.data.prep import reference_five_folds, reference_split_dataset

    all_data = {f"q{i}": i for i in range(25)}

    def notebook_split(all_data, train_ratio=0.8, seed=1):
        random.seed(seed)
        train_size = int(len(all_data) * train_ratio)
        train, test, key_list = {}, {}, list(all_data.keys())
        for _ in range(train_size):
            idx = random.randint(0, len(key_list) - 1)
            train[key_list[idx]] = all_data[key_list[idx]]
            key_list.pop(idx)
        for key in key_list:
            test[key] = all_data[key]
        return train, test

    for seed in (1, 2, 5):
        got = reference_split_dataset(all_data, seed=seed)
        want = notebook_split(all_data, seed=seed)
        assert got == want
    folds = reference_five_folds(all_data)
    assert sorted(folds) == [f"split_{i}" for i in range(1, 6)]
    for train, test in folds.values():
        assert len(train) == 20 and len(test) == 5
        assert not set(train) & set(test)


def test_prep_cli_bm25_pickles_and_matchzoo(tmp_path):
    """CLI paths for both raw formats end in a loadable dataset."""
    import pickle

    import pandas as pd

    from rlt_tpu.data.prep import main as prep_main

    # raw bm25 pickles
    with open(tmp_path / "raw.pkl", "wb") as f:
        pickle.dump({"queries": [_raw_bm25_query("301", 12, {0}),
                                 _raw_bm25_query("304", 12, {1}),
                                 _raw_bm25_query("305", 12, {2})]}, f)
    out1 = tmp_path / "out_bm25"
    prep_main(["--bm25-pickles", str(tmp_path / "raw.pkl"),
               "--out", str(out1), "--seq-len", "10"])
    data = load_pkl_dataset(str(out1), "robust04", "bm25", family="choopy")
    assert data.x_train.shape[0] + data.x_test.shape[0] == 3

    # matchzoo dataframe + gt pickle
    rows = [{"id_left": q, "id_right": f"{q}_d{j}", "relation_score": -float(j)}
            for q in ("301", "302", "303") for j in range(10)]
    with open(tmp_path / "mz.pkl", "wb") as f:
        pickle.dump(pd.DataFrame(rows), f)
    with open(tmp_path / "gt.pkl", "wb") as f:
        pickle.dump({q: [f"{q}_d0"] for q in ("301", "302", "303")}, f)
    out2 = tmp_path / "out_mz"
    prep_main(["--matchzoo-pkl", str(tmp_path / "mz.pkl"),
               "--gt-pkl", str(tmp_path / "gt.pkl"),
               "--out", str(out2), "--dataset-name", "drmm_tks",
               "--seq-len", "10"])
    data = load_pkl_dataset(str(out2), "robust04", "drmm_tks", family="choopy")
    assert data.x_train.shape[0] + data.x_test.shape[0] == 3


def test_pipeline_corpus_probe_generator():
    """The hypothesis-(a) probe's document generator
    (scripts/pipeline_corpus_probe.py): deterministic per seed, calibrated
    geometry (oracle well above greedy), and its output feeds the REAL
    feature pipeline end-to-end at tiny scale."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/scripts")
    from pipeline_corpus_probe import (build_features, corpus_baselines,
                                       gen_raw_corpus)

    tlpq, scores, y = gen_raw_corpus(0, num_queries=6, L=40, vocab_size=300,
                                     topics=6, rel_lo=3, rel_hi=12)
    tlpq2, scores2, y2 = gen_raw_corpus(0, num_queries=6, L=40,
                                        vocab_size=300, topics=6,
                                        rel_lo=3, rel_hi=12)
    assert (y == y2).all() and (scores == scores2).all()
    assert tlpq["0"][0] == tlpq2["0"][0]
    assert scores.shape == (6, 40) and y.shape == (6, 40)
    assert 0 < y.sum() < y.size
    # ranked by score within each query
    assert all((np.diff(s) <= 1e-6).all() for s in scores)

    base = corpus_baselines(y)
    assert 0.2 < base["greedy_f1"] <= base["oracle_f1"] <= 1.0

    x, meta = build_features(tlpq, scores, d2v_epochs=2, seed=0)
    assert x.shape == (6, 40, 3)
    assert np.isfinite(x).all()
    # neighbor-sim channels are correlations in [-1, 1]
    assert np.abs(x[:, :, 1:]).max() <= 1.0 + 1e-5
