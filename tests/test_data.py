"""Data substrate tests: synthetic stats, pkl ingestion (reference loader
format, attncut_dataloader.py:21-59), features, batching."""

import os
import pickle

import jax
import numpy as np
import pytest

from rlt_tpu.data import (
    RankedListData,
    epoch_permutation,
    load_pkl_dataset,
    synthetic_dataset,
)
from rlt_tpu.data.features import (
    doc_stats,
    neighbor_cosine_similarity,
    tfidf_vectors,
)


def test_synthetic_shapes_and_stats():
    data = synthetic_dataset(num_queries=100, seq_len=300, num_features=3, seed=0)
    assert data.x_train.shape == (80, 300, 3)
    assert data.y_train.shape == (80, 300)
    assert data.x_test.shape == (20, 300, 3)
    assert set(np.unique(data.y_train)) <= {0.0, 1.0}
    # robust04-like: tens of relevant docs per query, top-heavy
    per_query = data.y_train.sum(axis=1)
    assert 20 < per_query.mean() < 80
    top_half = data.y_train[:, :150].sum()
    assert top_half > 0.55 * data.y_train.sum()


def test_synthetic_deterministic():
    a = synthetic_dataset(num_queries=20, seed=7)
    b = synthetic_dataset(num_queries=20, seed=7)
    np.testing.assert_array_equal(a.x_train, b.x_train)
    c = synthetic_dataset(num_queries=20, seed=8)
    assert not np.array_equal(a.x_train, c.x_train)


def test_hard_profile_geometry():
    """The `_hard` profile keeps the oracle ceiling but opens a wide gap to
    the train-fit fixed-k floor (the discriminative region models must climb
    by reading per-list evidence — real-corpus geometry, reference
    hyper_parameter_drmm_tks.conf:42 vs Baseline/Oracle.ipynb oracle)."""
    import jax.numpy as jnp

    from rlt_tpu.data.datasets import synthetic_config
    from rlt_tpu.utils import metrics

    cfg = synthetic_config("robust04", "drmm_tks_hard")
    assert cfg["evidence_flip"] > 0 and cfg["relevant_spread"] > 0
    d = synthetic_dataset(num_queries=250, seq_len=300, num_features=3,
                          seed=0, **cfg)
    rw_tr = metrics.reward_matrix(jnp.asarray(d.y_train), "f1")
    rw_te = metrics.reward_matrix(jnp.asarray(d.y_test), "f1")
    oracle = float(jnp.mean(jnp.max(rw_te, axis=1)))
    kfix = int(jnp.argmax(jnp.mean(rw_tr, axis=0)))
    fixed = float(jnp.mean(rw_te[:, kfix]))
    assert 0.80 < oracle < 0.88          # ceiling unchanged vs standard
    assert fixed < oracle - 0.06         # wide evidence-reading gap
    # per-query relevant-count spread is what breaks rank-only cuts
    assert d.y_test.sum(axis=1).std() > 12.0


def test_hard_profile_determinism_and_default_isolation():
    """Hard knobs are deterministic per seed, and all-default knobs are
    BIT-identical to the pre-hard generator (the standard profile's oracle
    calibration must never drift when knobs are added)."""
    from rlt_tpu.data.datasets import SYNTHETIC_HARD_PROFILE

    a = synthetic_dataset(num_queries=20, seed=7, **SYNTHETIC_HARD_PROFILE)
    b = synthetic_dataset(num_queries=20, seed=7, **SYNTHETIC_HARD_PROFILE)
    np.testing.assert_array_equal(a.x_train, b.x_train)
    assert not np.array_equal(
        a.x_train, synthetic_dataset(num_queries=20, seed=7).x_train)
    # all knobs at their defaults consume no extra RNG draws
    plain = synthetic_dataset(num_queries=20, seed=7)
    explicit = synthetic_dataset(num_queries=20, seed=7, evidence_flip=0.0,
                                 nuisance_gain=0.0, subtypes=0,
                                 noise_scale=1.0, relevant_spread=0.0)
    np.testing.assert_array_equal(plain.x_train, explicit.x_train)
    np.testing.assert_array_equal(plain.y_train, explicit.y_train)


def _write_reference_format_pkls(base, retrieve="robust04", name="bm25",
                                 n_q=6, seq_len=10, n_stats=2):
    """Tiny dataset in the exact reference on-disk layout."""
    rng = np.random.default_rng(0)
    db = os.path.join(base, retrieve)
    os.makedirs(os.path.join(db, "attncut"), exist_ok=True)
    os.makedirs(os.path.join(db, "mtcut"), exist_ok=True)
    gt, splits = {}, {}
    for split in ("train", "test"):
        scores, stats = {}, {}
        for qi in range(n_q):
            qid = f"{split}{qi}"
            docs = [f"{qid}_d{j}" for j in range(seq_len)]
            scores[qid] = dict(zip(docs, np.sort(rng.random(seq_len))[::-1].tolist()))
            stats[qid] = rng.random((seq_len, n_stats)).tolist()
            gt[qid] = [d for d in docs if rng.random() < 0.3]
        splits[split] = (scores, stats)
        with open(os.path.join(db, f"{name}_{split}.pkl"), "wb") as f:
            pickle.dump(scores, f)
        for sub in ("attncut", "mtcut"):
            with open(os.path.join(db, sub, f"{name}_{split}.pkl"), "wb") as f:
                pickle.dump(stats, f)
    with open(os.path.join(db, "gt.pkl"), "wb") as f:
        pickle.dump(gt, f)
    return splits, gt


def test_pkl_ingestion_matches_reference_join(tmp_path):
    base = str(tmp_path)
    splits, gt = _write_reference_format_pkls(base)
    data = load_pkl_dataset(base, "robust04", "bm25", family="attncut")
    assert data.x_train.shape == (6, 10, 3)  # score + 2 stats
    scores, stats = splits["train"]
    qid0 = list(scores.keys())[0]
    np.testing.assert_allclose(
        data.x_train[0, :, 0], np.asarray(list(scores[qid0].values())), rtol=1e-6
    )
    np.testing.assert_allclose(
        data.x_train[0, :, 1:], np.asarray(stats[qid0]), rtol=1e-6
    )
    rel = set(gt[qid0])
    expected_y = [1.0 if d in rel else 0.0 for d in scores[qid0]]
    np.testing.assert_array_equal(data.y_train[0], expected_y)


def test_pkl_ingestion_choopy_scores_only(tmp_path):
    base = str(tmp_path)
    _write_reference_format_pkls(base)
    data = load_pkl_dataset(base, "robust04", "bm25", family="choopy")
    assert data.x_train.shape == (6, 10, 1)


def test_epoch_permutation_covers_all_rows():
    key = jax.random.PRNGKey(0)
    idx, valid = epoch_permutation(key, n=10, batch_size=4)
    assert idx.shape == (3, 4) and valid.shape == (3, 4)
    real = np.asarray(idx)[np.asarray(valid) == 1.0]
    assert sorted(real.tolist()) == list(range(10))
    assert float(np.asarray(valid).sum()) == 10.0


def test_epoch_permutation_exact_batches():
    idx, valid = epoch_permutation(jax.random.PRNGKey(1), n=8, batch_size=4)
    assert idx.shape == (2, 4)
    assert float(np.asarray(valid).min()) == 1.0


def test_neighbor_cosine_similarity_hand_example():
    # orthogonal vectors -> similarity 0; identical -> 1
    v = np.eye(3, dtype=np.float32)
    out = neighbor_cosine_similarity(v)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0], atol=1e-6)
    v2 = np.ones((4, 2), dtype=np.float32)
    np.testing.assert_allclose(neighbor_cosine_similarity(v2), 1.0, atol=1e-6)


def test_doc_stats_and_tfidf():
    toks = [["a", "b", "a"], ["b", "c", "d"]]
    stats = doc_stats(toks)
    np.testing.assert_array_equal(stats, [[3, 2], [3, 3]])
    mat, vocab = tfidf_vectors(toks)
    assert mat.shape == (2, 4)
    norms = np.linalg.norm(mat, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-5)


def test_sparse_tfidf_matches_dense():
    from rlt_tpu.data.features import (
        corpus_idf, tfidf_sparse, tfidf_vectors,
        neighbor_cosine_similarity, _neighbor_cos_sparse,
    )

    toks = [["a", "b", "a"], ["b", "c"], ["a", "c", "d"], ["d", "d", "b"]]
    dense, vocab = tfidf_vectors(toks)
    idf = corpus_idf(toks)
    sparse = tfidf_sparse(toks, idf)
    dense_sims = neighbor_cosine_similarity(dense)
    sparse_sims = _neighbor_cos_sparse(sparse)
    np.testing.assert_allclose(sparse_sims, dense_sims, atol=1e-6)


def test_shard_helpers_return_arrays():
    import jax

    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = []
    if len(devs) < 2:
        import pytest

        pytest.skip("needs multiple cpu devices")
    from rlt_tpu.parallel import data_parallel_mesh, shard_dataset
    from rlt_tpu.data import synthetic_dataset

    mesh = data_parallel_mesh(2, devices=devs[:2])
    data = synthetic_dataset(num_queries=10, seq_len=8, num_features=3, seed=0)
    xt, yt, xe, ye = shard_dataset(data, mesh)
    assert xt.shape[0] % 2 == 0 and xt.shape[1:] == (8, 3)


def test_simi_list_two_feature_variant():
    """data_review.ipynb cells 19-20: attncut features as just
    [tfidf_sim, d2v_sim] (simi_list), no doc-length stats."""
    from rlt_tpu.data.features import build_stat_features

    rng = np.random.default_rng(0)
    per_query = {"q1": [list(rng.choice(["a", "b", "c", "d"], size=6))
                        for _ in range(4)]}
    emb = {"q1": rng.standard_normal((4, 8)).astype(np.float32)}
    full = build_stat_features(per_query, embeddings_per_query=emb)
    two = build_stat_features(per_query, embeddings_per_query=emb,
                              include_doc_stats=False)
    assert full["q1"].shape == (4, 4) and two["q1"].shape == (4, 2)
    np.testing.assert_array_equal(two["q1"], full["q1"][:, 2:])


def test_bicut_dense_tfidf_features():
    """document_statics.ipynb cells 62-66: bicut block = [len, uniq,
    dense corpus-level tf-idf], rows L2-normalized."""
    from rlt_tpu.data.features import build_bicut_features

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(12)]
    per_query = {
        "q1": [list(rng.choice(vocab, size=8)) for _ in range(3)],
        "q2": [list(rng.choice(vocab, size=8)) for _ in range(2)],
    }
    feats = build_bicut_features(per_query)
    n_vocab = len({t for toks in per_query.values() for doc in toks for t in doc})
    assert feats["q1"].shape == (3, 2 + n_vocab)
    assert feats["q2"].shape == (2, 2 + n_vocab)
    # doc stats in the first two columns
    np.testing.assert_array_equal(feats["q1"][:, 0], 8.0)
    # dense tf-idf rows are L2-normalized (or all-zero)
    norms = np.linalg.norm(feats["q1"][:, 2:], axis=1)
    assert ((np.abs(norms - 1.0) < 1e-5) | (norms == 0)).all()


def test_neighbor_cosine_single_document_list():
    """A one-document ranked list has no neighbors: the similarity feature is
    0, not an IndexError aborting the offline pipeline (document_statics.ipynb
    cells 44-57 always has >=2 docs; the degenerate case must still not
    crash)."""
    from rlt_tpu.data.features import neighbor_cosine_similarity

    out = neighbor_cosine_similarity(np.ones((1, 4), dtype=np.float32))
    np.testing.assert_array_equal(out, np.zeros((1,), dtype=np.float32))


def test_subtype_polarity_flips_channel_evidence():
    """With subtype_polarity=1 and 4 subtypes, each stat channel must carry
    POSITIVE relevance evidence for its even subtype group and NEGATIVE for
    its odd group — so no unconditional pointwise read of a channel works.
    Subtype/grouping is reconstructed from the generator's own rng stream."""
    import numpy as np

    from rlt_tpu.data.datasets import synthetic_dataset

    n, L, F, seed = 120, 64, 3, 11

    def build(polarity):
        return synthetic_dataset(
            num_queries=n, seq_len=L, num_features=F, retrieval_quality=19.5,
            mean_relevant=10.0, seed=seed, subtypes=4,
            subtype_polarity=polarity, train_fraction=1.0)

    # replay the generator's rng to recover each query's subtype: draws
    # before `subtype` are the per-query placement choices (same count with
    # relevant_spread=0: one poisson + one choice per query)
    rng = np.random.default_rng(seed)
    place = np.exp(-19.5 * np.arange(L, dtype=np.float32) / L)
    for _ in range(n):
        k = min(max(1, int(rng.poisson(10.0))), L)
        rng.choice(L, size=k, replace=False, p=place / place.sum())
    subtype = rng.integers(0, 4, size=n)

    flipped = build(1.0)
    assert np.array_equal(flipped.x_train, build(1.0).x_train)  # determinism

    # polarity=0 vs 1 share every rng draw — the ONLY difference is the sign
    # of the informative-channel evidence term, so the delta isolates it:
    # odd-group rows get delta = -1.2*w*y_obs (negative wherever y_obs=1,
    # pre-smoothing), even-group rows are bit-identical in every channel.
    base = build(0.0)
    delta = flipped.x_train - base.x_train
    changed = np.abs(delta).sum(axis=(1, 2)) > 1e-6
    # the permutation reorders rows, so compare counts, not positions
    assert changed.sum() > 0
    assert (~changed).sum() > 0
    odd_count = int(((subtype // 2) % 2 == 1).sum())
    # rows with no relevant docs observed in the informative channel could in
    # principle be unchanged, but with mean 10 relevants that is negligible
    assert abs(changed.sum() - odd_count) <= 2
    # and the changed rows' informative-channel evidence is flipped: delta is
    # everywhere <= 0 against the positive-evidence baseline
    assert delta.max() <= 1e-6


def test_hetero_reliability_axis():
    """hetero_reliability (VERDICT r3 ask #1): each query's per-channel
    evidence strength must track its Dirichlet reliability share, and each
    channel's noise level must anti-track it — so per-query routing over
    channels carries real signal while unconditional pooling dilutes it.
    Shares are recovered by replaying the generator's own rng stream."""
    import numpy as np

    from rlt_tpu.data.datasets import synthetic_dataset

    n, L, F, seed, h = 160, 128, 3, 5, 0.85

    def build():
        return synthetic_dataset(
            num_queries=n, seq_len=L, num_features=F, retrieval_quality=19.5,
            mean_relevant=20.0, seed=seed, hetero_reliability=h,
            train_fraction=1.0)

    data = build()
    assert np.array_equal(data.x_train, build().x_train)  # determinism

    # replay the rng: placement draws, score noise, dirichlet shares, two
    # per-channel stat-noise draws, then the split permutation
    rng = np.random.default_rng(seed)
    place = np.exp(-19.5 * np.arange(L, dtype=np.float32) / L)
    for _ in range(n):
        k = min(max(1, int(rng.poisson(20.0))), L)
        rng.choice(L, size=k, replace=False, p=place / place.sum())
    rng.standard_normal((n, L))                       # score noise
    alpha = max(0.15, 1.5 * (1.0 - h))
    share = rng.dirichlet(np.full(F - 1, alpha), size=n)  # (n, F-1)
    for _ in range(F - 1):
        rng.standard_normal((n, L))                   # stat noise
    perm = rng.permutation(n)
    share = share[perm]

    # wide spread: at alpha=0.225 most queries trust one channel
    assert float(np.mean(share.max(axis=1))) > 0.8

    x, y = data.x_train, data.y_train
    rel = y > 0.5
    for c in range(1, F):
        stat = x[:, :, c]
        evidence = np.array([
            stat[q][rel[q]].mean() - stat[q][~rel[q]].mean() for q in range(n)
        ])
        noise = np.array([stat[q][~rel[q]].std() for q in range(n)])
        s = share[:, c - 1]
        assert np.corrcoef(evidence, s)[0, 1] > 0.8
        assert np.corrcoef(noise, s)[0, 1] < -0.8
