"""Data substrate: pkl ingestion matching the reference loaders, a synthetic
ranked-list generator with robust04-like statistics (the real pickles are
gitignored in the reference, SURVEY §4), the offline feature pipeline, and
jit-friendly device-resident batching."""

from rlt_tpu.data.datasets import (  # noqa: F401
    RankedListData,
    dataset_feature_dim,
    load_pkl_dataset,
    synthetic_dataset,
)
from rlt_tpu.data.batching import DeviceDataset, epoch_permutation, num_batches  # noqa: F401
from rlt_tpu.data.features import (  # noqa: F401
    doc_stats,
    neighbor_cosine_similarity,
    tfidf_vectors,
)
from rlt_tpu.data.doc2vec import (  # noqa: F401
    Doc2Vec,
    doc2vec_embeddings_per_query,
    train_doc2vec,
)
from rlt_tpu.data.text import (  # noqa: F401
    STOPWORDS,
    clean_text,
    corpus_from_docset,
    tokens_for_ranked,
)
