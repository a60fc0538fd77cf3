"""Unigram-LM quality scoring (L39): the CCNet-style perplexity filter
(Wenzek et al. 2020 §3.3) with the KenLM model replaced by an add-alpha
unigram LM trained on a reference corpus — the classic curation signal
"how surprising is this document under a clean-corpus language model".

Reference scope: the reference app scores candidate mentions only
(app/lmss_classification.py); corpus-level quality scoring is part of
the training-data-curation surface SURVEY §2.11 mandates.

Model. Vocabulary = top ``vocab_size`` tokens of the reference corpus by
(count DESC, token ASC) — a deterministic cap that bounds the broadcast
side no matter how large the training corpus is.  With N = total count
over the kept vocabulary, V = kept vocabulary size, and alpha-smoothing
over V+1 classes (the +1 absorbs out-of-vocabulary mass):

    logp(t in vocab) = ln(c_t + alpha) - ln(N + alpha*(V+1))
    logp(OOV)        = ln(alpha)       - ln(N + alpha*(V+1))

Per document: cross_entropy = -(sum_t m_t * logp(t)) / n_tokens (nats),
perplexity = exp(cross_entropy); empty documents score (0.0, 1.0).

Scale shape. Training is one map-side-combinable ``groupBy(token)`` plus
a TakeOrdered top-V — no all-pairs; the resulting LM is BOUNDED
(<= vocab_size rows) and is collected exactly once, so the corpus-wide
scalars (N, V) fold into literals and the training scan runs a single
time (keeping it lazy would re-run the full-corpus aggregation for the
stats subtree and again for the join).  Scoring shuffles (doc_id,
token) multiplicities once (combinable), broadcast-joins the LM, then
aggregates per document.

Determinism contract (for the DuckDB oracle): the per-document log-prob
sum is NOT a floating ``SUM()`` (whose addend order is partition-
dependent) — it is a left-associative fold over the document's distinct
tokens in sorted order (``array_sort`` + ``aggregate`` here,
``list_sort`` + ``list_reduce`` in the oracle), so both engines add the
same doubles in the same order.  The remaining cross-engine delta is at
most 1 ulp in ``ln``/``exp`` libm rounding, far inside the checker's
9-significant-digit normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.dedup import _clean_tokens


def train_unigram_lm(
    corpus: DataFrame,
    vocab_size: int = 65536,
    text_col: str = "text",
) -> DataFrame:
    """(token, c) for the top ``vocab_size`` tokens of ``corpus`` by
    (count DESC, token ASC).  One combinable aggregation + TakeOrdered;
    the result is the broadcastable LM table for :func:`lm_quality_score`."""
    return (
        corpus.select(F.explode(_clean_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
    )


def lm_quality_score(
    docs: DataFrame,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM quality: doc_id, n_tokens, n_oov, cross_entropy
    (nats), perplexity.  ``lm`` defaults to a model trained on ``docs``
    itself (self-scoring — the standard "rank the corpus" mode); pass a
    :func:`train_unigram_lm` table from a clean reference corpus for
    CCNet-style filtering."""
    # Materialize the LM ONCE: it is bounded (train_unigram_lm caps it
    # at vocab_size rows; an externally passed lm must be similarly
    # bounded — it is a vocabulary, not a corpus).  Re-using the lazy
    # plan instead would re-run the full-corpus training aggregation
    # for the N/V stats AND again for the scoring join — a doubled
    # 100 TB scan in self-scoring mode.
    if lm is None:
        lm = train_unigram_lm(docs, vocab_size=vocab_size, text_col=text_col)
    vocab = [(r["token"], int(r["c"])) for r in lm.select("token", "c").collect()]
    n_total = float(sum(c for _, c in vocab))
    denom = F.log(F.lit(n_total) + F.lit(alpha) * (F.lit(float(len(vocab))) + F.lit(1.0)))
    spark = docs.sparkSession
    lm_local = spark.createDataFrame(vocab, "token string, c bigint")
    ids = docs.select(F.col(id_col).alias("doc_id"))
    mult = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_clean_tokens(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    scored = mult.join(F.broadcast(lm_local), "token", "left").select(
        "doc_id",
        "token",
        "m",
        (
            F.when(F.col("c").isNotNull(), F.log(F.col("c") + F.lit(alpha)))
            .otherwise(F.log(F.lit(alpha)))
            - denom
        ).alias("logp"),
        F.col("c").isNull().alias("oov"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("m").alias("n_tokens"),
        F.sum(F.when(F.col("oov"), F.col("m")).otherwise(F.lit(0))).alias("n_oov"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "m", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["m"].cast("double") * x["logp"],
        ).alias("_lp"),
    )
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.coalesce(-F.col("_lp") / F.col("n_tokens"), F.lit(0.0)).alias("cross_entropy"),
        F.coalesce(F.exp(-F.col("_lp") / F.col("n_tokens")), F.lit(1.0)).alias("perplexity"),
    )


def lm_quality_filter(
    docs: DataFrame,
    max_perplexity: float,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus minus documents whose perplexity under the LM exceeds
    ``max_perplexity`` (an absolute threshold — deterministic, unlike a
    quantile cut).  Implemented as a broadcast-friendly semi-join on the
    scored ids; all original columns pass through."""
    keep = lm_quality_score(
        docs, lm=lm, alpha=alpha, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    ).filter(F.col("perplexity") <= F.lit(max_perplexity)).select("doc_id")
    return docs.join(
        keep.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
