from .dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_neardup_pairs,
)
from .asof import asof_join  # noqa: F401
from .bm25 import bm25_topk, bm25_topk_indexed, write_bm25_index  # noqa: F401
from .curate import curate_corpus  # noqa: F401
from .components import connected_components, dedup_clusters  # noqa: F401
from .interval import range_join  # noqa: F401
from .quantize import dequantize_expr, quantize_embeddings  # noqa: F401
from .textprep import chunk_documents, pack_chunks, scrub_pii, stratified_sample  # noqa: F401
from .similarity import (  # noqa: F401
    assign_ivf_cells,
    cosine_expr,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_indexed,
    knn_lsh,
    train_ivf_centroids,
    write_ivf_index,
)
from .textstats import doc_fingerprint, language_id, quality_stats  # noqa: F401
from .pq import (  # noqa: F401
    encode_pq,
    knn_ivfpq,
    knn_ivfpq_indexed,
    knn_pq,
    train_pq_codebooks,
    write_ivfpq_index,
)
