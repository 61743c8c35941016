"""PV-DBOW doc2vec: the TPU-native replacement for the reference's gensim
Doc2Vec (data_prep/document_statics.ipynb cell :381, infer loop :13512)."""

import numpy as np
import pytest

from rlt_tpu.data.doc2vec import (
    Doc2Vec,
    build_doc2vec_vocab,
    doc2vec_embeddings_per_query,
    train_doc2vec,
)
from rlt_tpu.data.features import build_stat_features


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _two_topic_corpus(rng, docs_per_topic=12, doc_len=30):
    """Two disjoint topic vocabularies -> embeddings must separate them."""
    topic_a = [f"apple{i}" for i in range(20)]
    topic_b = [f"boat{i}" for i in range(20)]
    corpus, labels = [], []
    for t, words in enumerate([topic_a, topic_b]):
        for _ in range(docs_per_topic):
            corpus.append(list(rng.choice(words, size=doc_len)))
            labels.append(t)
    return corpus, np.asarray(labels)


def test_vocab_min_count_pruning():
    corpus = [["a", "a", "b"], ["a", "c"], ["c"]]
    vocab = build_doc2vec_vocab(corpus, min_count=2)
    assert set(vocab) == {"a", "c"}  # b occurs once -> pruned (min_count=2)
    assert build_doc2vec_vocab(corpus, min_count=1).keys() == {"a", "b", "c"}


def test_empty_vocab_raises():
    with pytest.raises(ValueError):
        train_doc2vec([["x"], ["y"]], min_count=2, vector_size=8, epochs=1)


def test_trained_docvecs_cluster_by_topic():
    rng = np.random.default_rng(0)
    corpus, labels = _two_topic_corpus(rng)
    model = train_doc2vec(
        corpus, vector_size=16, min_count=1, epochs=40, batch_size=128, seed=0
    )
    assert model.docvecs.shape == (len(corpus), 16)
    assert np.isfinite(model.docvecs).all() and np.isfinite(model.wordvecs).all()
    same, cross = [], []
    for i in range(len(corpus)):
        for j in range(i + 1, len(corpus)):
            (same if labels[i] == labels[j] else cross).append(
                _cos(model.docvecs[i], model.docvecs[j])
            )
    # within-topic similarity must clearly dominate cross-topic
    assert np.mean(same) > np.mean(cross) + 0.2


def test_infer_vector_lands_near_its_topic():
    rng = np.random.default_rng(1)
    corpus, labels = _two_topic_corpus(rng)
    model = train_doc2vec(
        corpus, vector_size=16, min_count=1, epochs=15, batch_size=128, seed=0
    )
    held_out = [f"apple{i}" for i in rng.integers(0, 20, size=30)]
    vec = model.infer_vector(held_out, steps=30)
    assert vec.shape == (16,) and np.isfinite(vec).all()
    sim_a = np.mean([_cos(vec, model.docvecs[i]) for i in np.where(labels == 0)[0]])
    sim_b = np.mean([_cos(vec, model.docvecs[i]) for i in np.where(labels == 1)[0]])
    assert sim_a > sim_b


def test_infer_vector_oov_only_tokens():
    corpus = [["a", "b", "a"], ["b", "a", "b"]]
    model = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=2, seed=0)
    vec = model.infer_vector(["zzz", "qqq"])  # all OOV -> valid mask all zero
    assert vec.shape == (8,) and np.isfinite(vec).all()


def test_determinism_same_seed():
    corpus = [["a", "b", "c", "a"], ["c", "b", "a"], ["b", "b", "c"]]
    m1 = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=3, seed=7)
    m2 = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=3, seed=7)
    np.testing.assert_array_equal(m1.docvecs, m2.docvecs)
    np.testing.assert_array_equal(m1.wordvecs, m2.wordvecs)


def test_end_to_end_feature_block_with_doc2vec():
    """Full document_statics.ipynb path: corpus -> doc2vec -> per-query
    embeddings -> 4-feature attncut stat block [len, uniq, tfidf_sim, d2v_sim]."""
    rng = np.random.default_rng(2)
    per_query = {
        "301": [list(rng.choice([f"w{i}" for i in range(30)], size=20)) for _ in range(5)],
        "302": [list(rng.choice([f"v{i}" for i in range(30)], size=20)) for _ in range(4)],
    }
    corpus = [t for toks in per_query.values() for t in toks]
    model = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=3, seed=0)

    emb = doc2vec_embeddings_per_query(model, per_query)
    assert emb["301"].shape == (5, 8) and emb["302"].shape == (4, 8)
    # positional lookup must match explicit doc_index lookup
    idx = {"301": {i: i for i in range(5)}, "302": {i: 5 + i for i in range(4)}}
    emb_idx = doc2vec_embeddings_per_query(model, per_query, doc_index=idx)
    for qid in per_query:
        np.testing.assert_array_equal(emb[qid], emb_idx[qid])

    feats = build_stat_features(per_query, embeddings_per_query=emb)
    assert feats["301"].shape == (5, 4)
    d2v_sim = feats["301"][:, 3]
    assert np.isfinite(d2v_sim).all() and (np.abs(d2v_sim) <= 1.0 + 1e-5).all()

    emb_inf = doc2vec_embeddings_per_query(
        model, {"301": per_query["301"][:2]}, infer=True
    )
    assert emb_inf["301"].shape == (2, 8)


def test_infer_respects_max_len_padding():
    corpus = [["a", "b"] * 10, ["b", "a"] * 10]
    model = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=2, seed=0)
    long_doc = ["a", "b"] * 600  # 1200 tokens > max_len=512
    vec = model.infer_vector(long_doc)
    assert vec.shape == (8,) and np.isfinite(vec).all()


def test_infer_vectors_batched_matches_single():
    corpus = [["a", "b", "c"] * 5, ["c", "b", "a"] * 5, ["b", "c"] * 5]
    model = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=2, seed=0)
    batch = model.infer_vectors(corpus, steps=5)
    singles = np.stack([model.infer_vector(t, steps=5) for t in corpus])
    # vmapped vs single execution differ only by float32 fusion order
    np.testing.assert_allclose(batch, singles, rtol=1e-4, atol=1e-7)
    # distinct documents must not share the init/negative stream
    assert not np.allclose(batch[0], batch[2])


def test_positional_lookup_size_mismatch_raises():
    corpus = [["a", "b"], ["b", "a"], ["a", "a"]]
    model = train_doc2vec(corpus, vector_size=8, min_count=1, epochs=1, seed=0)
    with pytest.raises(ValueError, match="doc_index"):
        doc2vec_embeddings_per_query(model, {"q": corpus[:2]})  # 2 != 3


# ---------------------------------------------------------------------------
# PV-DM vs PV-DBOW equivalence (VERDICT r3 ask #9)
# ---------------------------------------------------------------------------
# The reference's gensim Doc2Vec call uses the library default dm=1 (PV-DM);
# rlt_tpu implements PV-DBOW. The only consumer of either is the NEIGHBOR
# COSINE SIMILARITY feature (features.py::neighbor_cosine_similarity), so
# the equivalence that matters is distributional: do the two objectives
# induce the same neighbor-sim geometry? The reference below is a
# self-contained numpy PV-DM trainer (gensim semantics: summed context
# window + doc vector predicts the center word via negative sampling,
# dm_mean=0, window=5) — independent code, not a port of doc2vec.py.


def _train_pvdm_numpy(token_lists, dim=32, window=5, epochs=30, lr=0.025,
                      negatives=5, min_count=1, seed=0):
    from rlt_tpu.data.doc2vec import NEG_SAMPLING_POWER, build_doc2vec_vocab

    rng = np.random.default_rng(seed)
    vocab = build_doc2vec_vocab(token_lists, min_count=min_count)
    ids = [[vocab[t] for t in toks if t in vocab] for toks in token_lists]
    counts = np.zeros(len(vocab))
    for doc in ids:
        for w in doc:
            counts[w] += 1
    probs = counts ** NEG_SAMPLING_POWER
    neg_cdf = np.cumsum(probs / probs.sum())

    D = rng.uniform(-0.5 / dim, 0.5 / dim, (len(ids), dim))
    Win = rng.uniform(-0.5 / dim, 0.5 / dim, (len(vocab), dim))
    Wout = np.zeros((len(vocab), dim))

    examples = [(d, t) for d, doc in enumerate(ids) for t in range(len(doc))]
    for epoch in range(epochs):
        alpha = lr * (1.0 - epoch / epochs)
        rng.shuffle(examples)
        for d, t in examples:
            doc = ids[d]
            ctx = doc[max(0, t - window):t] + doc[t + 1:t + 1 + window]
            h = D[d] + (Win[ctx].sum(axis=0) if ctx else 0.0)  # dm_mean=0: sum
            targets = [doc[t]] + list(
                np.searchsorted(neg_cdf, rng.random(negatives)))
            labels = np.array([1.0] + [0.0] * negatives)
            out = Wout[targets]
            g = (labels - 1.0 / (1.0 + np.exp(-out @ h))) * alpha  # (1+neg,)
            dh = g @ out
            Wout[targets] += np.outer(g, h)
            D[d] += dh
            if ctx:
                Win[ctx] += dh
    return D


def _mixture_corpus(rng, n_topics=3, n_docs=90, doc_len=60, vocab_per=40):
    """Docs with CONTINUOUS per-doc topic mixtures (Dirichlet 0.4), so
    consecutive-pair similarity spans a whole range instead of a binary
    same/cross-cluster split — the regime where two embedding objectives can
    actually be compared as distributions. Returns (docs, mixture-overlap
    ground truth per consecutive pair)."""
    topics = [[f"t{k}w{i}" for i in range(vocab_per)] for k in range(n_topics)]
    mix = rng.dirichlet([0.4] * n_topics, size=n_docs)
    docs = []
    for i in range(n_docs):
        counts = rng.multinomial(doc_len, mix[i])
        words = [w for k, c in enumerate(counts)
                 for w in rng.choice(topics[k], c)]
        rng.shuffle(words)
        docs.append(words)
    gt = (mix[1:] * mix[:-1]).sum(1) / (
        np.linalg.norm(mix[1:], axis=1) * np.linalg.norm(mix[:-1], axis=1))
    return docs, gt


def test_pvdm_and_pvdbow_neighbor_sims_agree():
    """The PV-DM (gensim-default) and PV-DBOW (ours) objectives must induce
    the same neighbor-sim feature geometry. Measured on the mixture corpus
    (recorded in RESULTS.md): Pearson r(dm, dbow) = 0.69 across consecutive
    pairs, and PV-DBOW tracks the latent topic-overlap ground truth BETTER
    than PV-DM (0.66 vs 0.34) — the PV-DBOW choice loses nothing for this
    feature. Thresholds sit with margin below those measurements."""
    from rlt_tpu.data.doc2vec import train_doc2vec
    from rlt_tpu.data.features import neighbor_cosine_similarity

    rng = np.random.default_rng(1)
    docs, gt = _mixture_corpus(rng)

    dbow = train_doc2vec(docs, vector_size=32, min_count=1, epochs=30,
                         seed=0).docvecs
    dm = _train_pvdm_numpy(docs, dim=32, epochs=30, seed=0)

    sims_dbow = neighbor_cosine_similarity(dbow)[1:]  # row 0 is the pad
    sims_dm = neighbor_cosine_similarity(dm)[1:]

    r = np.corrcoef(sims_dbow, sims_dm)[0, 1]
    assert r > 0.55, f"neighbor-sim correlation PV-DM vs PV-DBOW: r={r:.3f}"
    r_dbow = np.corrcoef(sims_dbow, gt)[0, 1]
    r_dm = np.corrcoef(sims_dm, gt)[0, 1]
    assert r_dbow > 0.5, f"PV-DBOW vs latent overlap: r={r_dbow:.3f}"
    assert r_dm > 0.15, f"PV-DM vs latent overlap: r={r_dm:.3f}"
    # the framework's objective must not be the worse tracker of the truth
    assert r_dbow > r_dm - 0.05
