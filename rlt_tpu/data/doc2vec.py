"""TPU-native doc2vec (PV-DBOW) for the offline feature pipeline.

The reference trains gensim ``Doc2Vec(vector_size=200, min_count=2,
epochs=40)`` over the tokenized corpus and calls ``infer_vector`` per
document to build the doc2vec neighbor-similarity feature
(data_prep/document_statics.ipynb cells 25-29 and the doc2vec.pkl export
around cell 13508). This module provides the same capability as a jitted
JAX program: PV-DBOW with negative sampling, trained as a `lax.scan` of
fixed-shape minibatch SGD steps, so the whole training run is one XLA
program per epoch and runs on TPU.

Differences from gensim are intentional and documented: gensim's PV-DBOW
uses asynchronous hogwild SGD with a decaying learning rate; here the
minibatch update is synchronous (deterministic, device-friendly) with the
same linear lr decay. The feature consumer only needs *relative* cosine
geometry between neighboring documents, which PV-DBOW establishes either
way; `tests/test_doc2vec.py` pins that geometry.
"""

from __future__ import annotations

import functools
import zlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG_SAMPLING_POWER = 0.75  # word2vec/gensim unigram^0.75 negative table


def build_doc2vec_vocab(
    token_lists: list[list[str]], min_count: int = 2
) -> dict[str, int]:
    """Vocabulary with gensim's ``min_count`` pruning (default 2, as the
    reference's Doc2Vec(min_count=2))."""
    counts: dict[str, int] = {}
    for toks in token_lists:
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
    vocab: dict[str, int] = {}
    for toks in token_lists:
        for tok in toks:
            if counts[tok] >= min_count and tok not in vocab:
                vocab[tok] = len(vocab)
    return vocab


def _corpus_pairs(
    token_lists: list[list[str]], vocab: dict[str, int]
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, word_id) training pairs + unigram counts for the neg table."""
    docs, words = [], []
    counts = np.zeros((len(vocab),), dtype=np.float64)
    for d, toks in enumerate(token_lists):
        for tok in toks:
            w = vocab.get(tok)
            if w is not None:
                docs.append(d)
                words.append(w)
                counts[w] += 1.0
    pairs = np.stack(
        [np.asarray(docs, dtype=np.int32), np.asarray(words, dtype=np.int32)], axis=1
    )
    return pairs, counts


@functools.partial(jax.jit, static_argnames=("negatives",))
def _epoch(doc_emb, word_emb, pairs, neg_cdf, lr, key, negatives: int):
    """One epoch: scan over fixed-size minibatches of (doc, word) pairs.

    pairs: (num_batches, batch, 2) pre-permuted on host. For each positive
    pair, `negatives` word ids are drawn from the unigram^0.75 CDF via
    inverse-transform sampling (searchsorted), and the PV-DBOW objective
    logσ(d·w⁺) + Σ logσ(−d·w⁻) is ascended with plain SGD. The loss is
    SUMMED over the batch (not averaged) so one pass at lr α applies the
    same per-pair step magnitude as gensim's per-sample SGD at alpha=α,
    independent of batch size.
    """

    def step(carry, batch_and_key):
        d_emb, w_emb = carry
        batch, k = batch_and_key
        did, wid = batch[:, 0], batch[:, 1]
        neg = jnp.searchsorted(
            neg_cdf, jax.random.uniform(k, (batch.shape[0], negatives))
        ).astype(jnp.int32)

        def loss_fn(d_emb, w_emb):
            d = d_emb[did]  # (B, dim)
            pos = jnp.einsum("bd,bd->b", d, w_emb[wid])
            negs = jnp.einsum("bd,bnd->bn", d, w_emb[neg])
            ll = jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-negs).sum(axis=1)
            return -ll.sum()

        grads = jax.grad(loss_fn, argnums=(0, 1))(d_emb, w_emb)
        return (d_emb - lr * grads[0], w_emb - lr * grads[1]), None

    keys = jax.random.split(key, pairs.shape[0])
    (doc_emb, word_emb), _ = jax.lax.scan(step, (doc_emb, word_emb), (pairs, keys))
    return doc_emb, word_emb


def _infer_core(word_emb, word_ids, valid, neg_cdf, lr0, key, steps: int, negatives: int):
    """gensim-style ``infer_vector``: freeze word_emb, fit one fresh doc
    vector by `steps` gradient passes over the document's (padded) tokens."""
    dim = word_emb.shape[1]
    k0, key = jax.random.split(key)
    vec = jax.random.uniform(k0, (dim,), minval=-0.5 / dim, maxval=0.5 / dim)

    def step(carry, inputs):
        vec = carry
        i, k = inputs
        neg = jnp.searchsorted(
            neg_cdf, jax.random.uniform(k, (word_ids.shape[0], negatives))
        ).astype(jnp.int32)

        def loss_fn(vec):
            pos = word_emb[word_ids] @ vec
            negs = jnp.einsum("bnd,d->bn", word_emb[neg], vec)
            ll = jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-negs).sum(axis=1)
            return -(ll * valid).sum()

        lr = lr0 * (1.0 - i / steps)
        return vec - lr * jax.grad(loss_fn)(vec), None

    keys = jax.random.split(key, steps)
    vec, _ = jax.lax.scan(step, vec, (jnp.arange(steps, dtype=jnp.float32), keys))
    return vec


@functools.lru_cache(maxsize=None)
def _infer_batch_fn(steps: int, negatives: int):
    """Jitted vmap of `_infer_core` over (word_ids, valid, key) — one device
    dispatch infers a whole batch of documents."""
    core = functools.partial(_infer_core, steps=steps, negatives=negatives)
    return jax.jit(jax.vmap(core, in_axes=(None, 0, 0, None, None, 0)))


@dataclass
class Doc2Vec:
    """Trained PV-DBOW model. ``docvecs[i]`` is document i's vector; use
    `infer_vector` for held-out token lists (or to mirror the reference,
    which re-infers even for in-corpus documents)."""

    vocab: dict[str, int]
    docvecs: np.ndarray  # (num_docs, dim)
    wordvecs: np.ndarray  # (vocab, dim)
    neg_cdf: np.ndarray  # (vocab,) cumulative unigram^0.75 distribution
    lr: float
    negatives: int
    seed: int

    def _encode(self, tokens: list[str], max_len: int):
        ids = [self.vocab[t] for t in tokens if t in self.vocab][:max_len]
        word_ids = np.zeros((max_len,), dtype=np.int32)
        valid = np.zeros((max_len,), dtype=np.float32)
        word_ids[: len(ids)] = ids
        valid[: len(ids)] = 1.0
        return word_ids, valid

    def infer_vectors(
        self, token_lists: list[list[str]], steps: int = 40, max_len: int = 512
    ) -> np.ndarray:
        """Batched ``infer_vector``: one jitted vmapped dispatch for all
        documents. Each document gets its own PRNG key (derived from its
        token-id content), so inits and negative draws are independent across
        documents yet deterministic — gensim likewise seeds inference
        per document."""
        encoded = [self._encode(toks, max_len) for toks in token_lists]
        word_ids = np.stack([w for w, _ in encoded])
        valid = np.stack([v for _, v in encoded])
        base = jax.random.PRNGKey(self.seed + 1)
        keys = jnp.stack(
            [
                jax.random.fold_in(base, zlib.crc32(w.tobytes()) & 0x7FFFFFFF)
                for w, _ in encoded
            ]
        )
        vecs = _infer_batch_fn(steps, self.negatives)(
            jnp.asarray(self.wordvecs),
            jnp.asarray(word_ids),
            jnp.asarray(valid),
            jnp.asarray(self.neg_cdf),
            self.lr,
            keys,
        )
        return np.asarray(vecs)

    def infer_vector(
        self, tokens: list[str], steps: int = 40, max_len: int = 512
    ) -> np.ndarray:
        return self.infer_vectors([tokens], steps=steps, max_len=max_len)[0]


def train_doc2vec(
    token_lists: list[list[str]],
    vector_size: int = 200,
    min_count: int = 2,
    epochs: int = 40,
    lr: float = 0.025,
    negatives: int = 5,
    batch_size: int = 256,
    seed: int = 0,
) -> Doc2Vec:
    """Train PV-DBOW over the corpus (defaults mirror the reference's
    Doc2Vec(vector_size=200, min_count=2, epochs=40), ipynb cell at :381).

    Learning rate decays linearly over epochs (gensim alpha -> min_alpha).
    Each epoch re-permutes the pair list on host and runs as one jitted
    scan; per-batch negative sampling happens on device.
    """
    vocab = build_doc2vec_vocab(token_lists, min_count=min_count)
    if not vocab:
        raise ValueError("empty vocabulary: every token is below min_count")
    pairs, counts = _corpus_pairs(token_lists, vocab)
    if pairs.shape[0] == 0:
        raise ValueError("no training pairs after min_count pruning")

    probs = counts**NEG_SAMPLING_POWER
    neg_cdf = jnp.asarray(np.cumsum(probs / probs.sum()), dtype=jnp.float32)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    dim = vector_size
    k_d, k_w, key = jax.random.split(key, 3)
    doc_emb = jax.random.uniform(
        k_d, (len(token_lists), dim), minval=-0.5 / dim, maxval=0.5 / dim
    )
    word_emb = jax.random.uniform(
        k_w, (len(vocab), dim), minval=-0.5 / dim, maxval=0.5 / dim
    )

    batch_size = min(batch_size, pairs.shape[0])
    num_batches = pairs.shape[0] // batch_size
    for epoch in range(epochs):
        perm = rng.permutation(pairs.shape[0])[: num_batches * batch_size]
        batched = jnp.asarray(pairs[perm].reshape(num_batches, batch_size, 2))
        epoch_lr = lr * (1.0 - epoch / max(epochs, 1))
        key, k_e = jax.random.split(key)
        doc_emb, word_emb = _epoch(
            doc_emb, word_emb, batched, neg_cdf, epoch_lr, k_e, negatives
        )

    return Doc2Vec(
        vocab=vocab,
        docvecs=np.asarray(doc_emb),
        wordvecs=np.asarray(word_emb),
        neg_cdf=np.asarray(neg_cdf),
        lr=lr,
        negatives=negatives,
        seed=seed,
    )


def doc2vec_embeddings_per_query(
    model: Doc2Vec,
    token_lists_per_query: dict[str, list[list[str]]],
    doc_index: dict[str, dict[int, int]] | None = None,
    infer: bool = False,
) -> dict[str, np.ndarray]:
    """Per-query (L, dim) embedding matrices for `build_stat_features`.

    With ``infer=True`` every document is re-inferred (the reference's exact
    procedure — it calls infer_vector even for training documents, ipynb
    cell 13512); otherwise the trained docvecs are looked up via
    ``doc_index[qid][position] -> corpus row``, or positionally when the
    corpus was built by concatenating the queries' lists in dict order.
    """
    out: dict[str, np.ndarray] = {}
    if infer:
        for qid, toks in token_lists_per_query.items():
            out[qid] = model.infer_vectors(toks)
        return out
    if doc_index is not None:
        for qid, toks in token_lists_per_query.items():
            rows = [doc_index[qid][i] for i in range(len(toks))]
            out[qid] = model.docvecs[rows]
        return out
    total = sum(len(toks) for toks in token_lists_per_query.values())
    if total != model.docvecs.shape[0]:
        raise ValueError(
            f"positional lookup needs the corpus to be exactly the queries' "
            f"lists concatenated in dict order: {total} documents requested "
            f"vs {model.docvecs.shape[0]} trained docvecs; pass doc_index= "
            f"or infer=True instead"
        )
    offset = 0
    for qid, toks in token_lists_per_query.items():
        out[qid] = model.docvecs[offset : offset + len(toks)]
        offset += len(toks)
    return out
