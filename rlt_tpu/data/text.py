"""Raw-text front-end: document cleaning + tokenization.

Mirrors data_prep/document_statics.ipynb cells 4-6 (`get_corpus_element`),
the stage the feature pipeline previously assumed the user had run
themselves (VERDICT r3 ask #7): raw document text -> cleaned token lists
ready for `features.build_stat_features` / `doc2vec.train_doc2vec`.

Cleaning semantics (cell 5, reproduced step for step):

1. character substitutions, in the reference's order — quotes, slashes,
   newlines/tabs and dashes become spaces; periods are DELETED (so "U.S"
   joins to "us"); the TREC entities ``&hyph;`` / ``&blank;`` become spaces;
2. one regex pass replaces remaining punctuation AND digits with spaces;
3. lowercase, whitespace split, drop stopwords and single-character tokens;
4. drop tokens that appear only once WITHIN the document (the reference's
   per-document hapax filter — frequency is counted per document, not over
   the corpus).

Stopwords: the reference imports gensim's STOPWORDS (cell 4). gensim is not
installed here, so STOPWORDS is sklearn's ENGLISH_STOP_WORDS (318 words —
the same Glasgow IR list gensim extends) plus gensim's documented extras.
The union approximates gensim's 337-word set; the divergence is a handful
of rare words and only perturbs doc_len/unique_len counts by O(1) tokens.
"""

from __future__ import annotations

import re

from sklearn.feature_extraction.text import ENGLISH_STOP_WORDS

# words gensim.parsing.preprocessing.STOPWORDS adds on top of the Glasgow
# list sklearn ships verbatim
_GENSIM_EXTRA = frozenset("""
computer did didn does doesn doing don just kg km make quite really
regarding say unless used using various
""".split())

STOPWORDS = frozenset(ENGLISH_STOP_WORDS) | _GENSIM_EXTRA

# substitutions applied before the regex pass, in the reference's order
# (cell 5): all become a space except the period, which is deleted
_SPACE_CHARS = ('"', "/", "\\", "'", "\n", "\r", "\t", "-")
_ENTITY_CHARS = ("&hyph;", "&blank;")
_PUNCT_DIGITS = re.compile(r"[,?;*!%^&_+():\[\]{}`~@#$=+\\|/<>.'\"\d]")


def clean_text(text: str, stopwords: frozenset = STOPWORDS,
               drop_hapax: bool = True) -> list[str]:
    """Reference get_corpus_element (document_statics.ipynb cell 5):
    raw text -> cleaned token list. ``drop_hapax=False`` skips step 4 for
    callers that want every kept token (e.g. short queries)."""
    for ch in _SPACE_CHARS:
        text = text.replace(ch, " ")
    text = text.replace(".", "")
    for ch in _ENTITY_CHARS:
        text = text.replace(ch, " ")
    text = _PUNCT_DIGITS.sub(" ", text.strip().lower())
    tokens = [w for w in text.split() if w not in stopwords and len(w) > 1]
    if not drop_hapax:
        return tokens
    freq: dict[str, int] = {}
    for t in tokens:
        freq[t] = freq.get(t, 0) + 1
    return [t for t in tokens if freq[t] > 1]


def corpus_from_docset(docset: dict, fields=("title", "abstractText"),
                       **clean_kwargs) -> dict[str, list[str]]:
    """Cell 6: docset {doc_id: {"title": ..., "abstractText": ...}} (or
    {doc_id: raw_text}) -> {doc_id: cleaned token list}. Field values are
    concatenated in order; missing fields contribute nothing."""
    out = {}
    for doc_id, entry in docset.items():
        if isinstance(entry, str):
            text = entry
        else:
            text = " ".join(str(entry.get(f, "")) for f in fields)
        out[doc_id] = clean_text(text, **clean_kwargs)
    return out


def tokens_for_ranked(ranked: dict[str, dict[str, float]],
                      doc_tokens: dict[str, list[str]],
                      ) -> dict[str, list[list[str]]]:
    """Align a per-document token table with each query's ranked doc order —
    the shape `features.build_stat_features` consumes. Documents absent from
    the table get an empty token list (zero-length doc; its stat features
    are zeros and its tf-idf vector is empty, matching a document the
    reference's docset simply lacked)."""
    return {qid: [doc_tokens.get(d, []) for d in docs]
            for qid, docs in ranked.items()}
