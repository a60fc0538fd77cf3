"""BM25 ranked retrieval over a document corpus — the classic sparse
scoring function for training-data curation ("pull the top-k documents
matching this probe query") and the relational complement to the dense
kNN family in ops/similarity.py.

Okapi BM25:  score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
             idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Spark shape, built to scale:
  * one tokenize+explode pass builds (doc, term, tf) — the classic
    inverted-index build, map-side combinable;
  * document frequencies and corpus stats aggregate from that same
    relation;
  * the (tiny) query-term set broadcast-semi-joins the postings, so
    only postings of query terms flow into scoring — the inverted-index
    access path, not a full-corpus scan per query;
  * final per-doc score is one keyed sum + TakeOrderedAndProject top-k.

Everything is JVM column expressions (ln/sum/count) — no UDF — and the
whole formula is reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), _WS)
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a whitespace-tokenized query, ranked by BM25
    (ties break on ascending doc id).  Returns (doc_id, score, n_hits)
    where n_hits = how many distinct query terms the document contains.
    """
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("empty query")
    spark = docs.sparkSession
    qdf = spark.createDataFrame([(t,) for t in q_terms], "term string")

    post = _postings(docs, text_col, id_col)
    dlen = post.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    hits = post.join(F.broadcast(qdf), "term")  # inverted-index probe
    df_t = hits.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .join(dlen, "doc")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "tscore",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(F.sum("tscore").alias("score"), F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
        .select(
            F.col("doc").alias(id_col),
            F.round("score", 6).alias("score"),
            F.col("n_hits").cast("int").alias("n_hits"),
        )
    )
