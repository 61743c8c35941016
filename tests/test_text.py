"""Raw-text front-end (rlt_tpu/data/text.py): the document_statics.ipynb
cell-5 cleaning semantics, and the end-to-end path raw text -> prep CLI ->
loader -> Trainer (VERDICT r3 ask #7 — the last missing link for true
end-to-end prep from a raw corpus)."""

import pickle

import numpy as np

from rlt_tpu.data.text import (
    STOPWORDS,
    clean_text,
    corpus_from_docset,
    tokens_for_ranked,
)


def test_clean_text_reference_semantics():
    """Hand example exercising every cell-5 rule: periods join ("U.S"->"us",
    then dropped as len<=1... so use a longer acronym), dashes split, digits
    and punctuation vanish, stopwords and single chars drop, and tokens
    appearing once in the document drop (per-document hapax filter)."""
    text = ("The U.S.A. market-share rose 12% in 2019; marketshare\n"
            "data (really!) beats usa data &hyph; rocket, rocket")
    toks = clean_text(text)
    # "U.S.A." -> "usa" (periods deleted) appears twice -> kept, lowercase
    assert toks.count("usa") == 2
    # "market-share" -> "market share": each appears once -> hapax-dropped
    assert "market" not in toks and "share" not in toks
    # "marketshare" appears once -> dropped
    assert "marketshare" not in toks
    # digits and punctuation gone entirely
    assert not any(any(c.isdigit() for c in t) for t in toks)
    # stopwords: "the", "in", "really" (gensim extra) never survive
    assert "the" not in toks and "in" not in toks and "really" not in toks
    # "data" and "rocket" appear twice -> kept
    assert toks.count("data") == 2 and toks.count("rocket") == 2
    # hapax filter is positional-order preserving
    assert toks == [t for t in toks]  # still a plain list
    # drop_hapax=False keeps the single-occurrence tokens
    assert "market" in clean_text(text, drop_hapax=False)


def test_stopwords_cover_gensim_extras():
    for w in ("the", "and", "really", "km", "kg", "doesn"):
        assert w in STOPWORDS
    assert "relevance" not in STOPWORDS


def test_corpus_from_docset_fields_and_raw():
    docset = {
        "d1": {"title": "Neural networks networks", "abstractText": "deep deep"},
        "d2": "plain text text string string",
        "d3": {"title": "only title title"},  # missing abstract field
    }
    corpus = corpus_from_docset(docset)
    assert corpus["d1"] == ["networks", "networks", "deep", "deep"]
    assert corpus["d2"] == ["text", "text", "string", "string"]
    assert corpus["d3"] == ["title", "title"]


def test_tokens_for_ranked_aligns_and_defaults():
    ranked = {"q1": {"d2": 0.9, "d1": 0.5, "missing": 0.1}}
    doc_tokens = {"d1": ["aa", "aa"], "d2": ["bb"]}
    got = tokens_for_ranked(ranked, doc_tokens)
    assert got == {"q1": [["bb"], ["aa", "aa"], []]}


def test_prep_cli_raw_text_end_to_end(tmp_path):
    """Raw document text -> prep CLI (--docset-pkl) -> reference-layout pkls
    -> load_pkl_dataset -> one Trainer epoch. Covers the full
    document_statics front-end with no user preprocessing."""
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import load_pkl_dataset
    from rlt_tpu.data.prep import main as prep_main
    from rlt_tpu.train import Trainer

    rng = np.random.default_rng(0)
    n_q, L = 12, 8
    vocab = [f"w{i}" for i in range(30)]
    run_lines, qrel_lines, docset = [], [], {}
    for qi in range(n_q):
        qid = f"q{qi}"
        rel_cut = int(rng.integers(1, L - 1))
        for r in range(L):
            doc = f"{qid}_d{r}"
            run_lines.append(f"{qid} Q0 {doc} {r + 1} {1.0 - 0.1 * r:.3f} t")
            qrel_lines.append(f"{qid} 0 {doc} {1 if r < rel_cut else 0}")
            # each doc: repeated words so the hapax filter keeps them
            words = rng.choice(vocab, size=6).tolist()
            docset[doc] = {"title": " ".join(words + words),
                           "abstractText": "shared shared corpus corpus."}
    (tmp_path / "run.txt").write_text("\n".join(run_lines))
    (tmp_path / "qrels.txt").write_text("\n".join(qrel_lines))
    with open(tmp_path / "docset.pkl", "wb") as f:
        pickle.dump(docset, f)

    out = tmp_path / "dataset"
    prep_main([
        "--run", str(tmp_path / "run.txt"),
        "--qrels", str(tmp_path / "qrels.txt"),
        "--docset-pkl", str(tmp_path / "docset.pkl"),
        "--out", str(out), "--dataset-name", "bm25", "--seq-len", str(L),
    ])

    data = load_pkl_dataset(str(out), "robust04", "bm25", family="attncut")
    # score + [doc_len, unique_len, tfidf_neighbor_sim]
    assert data.x_train.shape[-1] == 4
    assert np.isfinite(data.x_train).all() and np.isfinite(data.x_test).all()

    cfg = TrainConfig(
        model_name="attncut", dataset_base=str(out), dataset_name="bm25",
        seq_len_override=L, input_size_override=4, batch_size=8, epochs=1,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
    )
    summary = Trainer(cfg).run()
    assert np.isfinite(summary["best_f1"])
