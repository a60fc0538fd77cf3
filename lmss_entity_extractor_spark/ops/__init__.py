from .dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_neardup_pairs,
)
from .asof import asof_join  # noqa: F401
from .similarity import assign_ivf_cells, cosine_expr, knn_bruteforce, knn_ivf, knn_lsh  # noqa: F401
from .textstats import doc_fingerprint, language_id, quality_stats  # noqa: F401
