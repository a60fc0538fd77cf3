"""End-to-end training-data curation: the individual operators composed
into ONE lazy dataflow — the shape an LLM-pretraining data pipeline
actually runs:

    documents
      └─ quality filter  (ops/textstats.py score — a narrow scan
         predicate applied FIRST, so junk never feeds the dedup shuffle)
           └─ MinHash+LSH near-dup pairs  (ops/dedup.py)
                └─ connected components  -> keep only cluster canonicals
                     └─ chunk       (sliding token windows)
                          └─ pack   (per-shard fixed-capacity bins)

Everything between the two keyed shuffles (dedup-pair generation and the
final packing cumsum) stays narrow; the drop/keep joins are broadcastable
(the non-canonical doc set is small relative to the corpus).  The whole
composition remains a single Catalyst plan — no intermediate
materialization — and its DuckDB oracle is the corresponding composition
of the per-operator SQL twins, so the *pipeline*, not just its pieces,
is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import dedup_clusters
from .dedup import minhash_lsh_pairs
from .textprep import chunk_documents, pack_chunks
from .textstats import quality_score_expr


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.7,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    chunk_tokens: int = 32,
    stride: int = 24,
    capacity: int = 64,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents -> packed training chunks of the deduplicated,
    quality-filtered corpus.

    Near-dup clusters keep only their canonical (minimum-id) member;
    docs below ``min_quality`` drop; survivors chunk into sliding token
    windows and pack into ``capacity``-token bins per shard.  Returns
    (doc_id, chunk_idx, shard, tok_offset, bin_id, chunk_text,
    n_chunk_tokens)."""
    # QUALITY FIRST, then dedup-cluster the survivors: clustering the
    # raw corpus and keeping min-id canonicals can evict every member of
    # a cluster whose canonical happens to be the junk copy (canonical
    # fails the gate, its clean near-duplicates were already dropped as
    # non-canonical).  Filtering first also shrinks the (expensive)
    # shingle explode to the docs that can actually ship.  The gate is a
    # pure function of the text — a narrow scan predicate, no stats join.
    quality_docs = docs.filter(quality_score_expr(text_col) >= min_quality)
    clusters = dedup_clusters(
        minhash_lsh_pairs(
            quality_docs, n=n, num_hashes=num_hashes, bands=bands, text_col=text_col, id_col=id_col
        )
    )
    # dedup_clusters emits fixed (doc_id, canonical_id) column names;
    # realias to the caller's id column for the anti join
    non_canonical = clusters.filter(F.col("doc_id") != F.col("canonical_id")).select(
        F.col("doc_id").alias(id_col)
    )

    # The anti join against the non-canonical set is left UNHINTED on
    # purpose: dup fractions range from ~0 (curated corpora) to 50%+
    # (web crawls), so the right strategy is size-dependent — AQE
    # broadcasts a small set and shuffle-joins a big one from its
    # measured size, where a forced broadcast would OOM the high-dup case.
    kept = quality_docs.join(non_canonical, id_col, "left_anti")
    # numeric ids shard by value (SQL-reproducible, used by the oracle);
    # string ids (URLs/UUIDs — supported by the whole dedup family) hash
    # first, since pmod on a string errors under ANSI mode
    id_type = dict(docs.dtypes).get(id_col, "")
    shard_key = (
        F.col(id_col)
        if id_type in ("tinyint", "smallint", "int", "bigint")
        else F.xxhash64(F.col(id_col))
    )
    chunks = chunk_documents(
        kept, chunk_tokens=chunk_tokens, stride=stride, text_col=text_col, id_col=id_col
    ).withColumn("shard", F.pmod(shard_key, F.lit(n_shards)).cast("int"))
    return pack_chunks(
        chunks, capacity=capacity, shard_col="shard", order_cols=[id_col, "chunk_idx"]
    ).select(
        id_col, "chunk_idx", "shard", "tok_offset", "bin_id", "chunk_text", "n_chunk_tokens"
    )
