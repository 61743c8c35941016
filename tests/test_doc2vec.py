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
