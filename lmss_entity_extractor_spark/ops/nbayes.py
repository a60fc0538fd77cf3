"""Multinomial Naive Bayes text classification (L136): the classic
at-scale text classifier — train = one combinable aggregation, score =
one broadcast join + per-doc fold ("label 100 TB of documents with a
model trained in a single pass").  Extends the curation family: L39
scores documents under ONE reference LM; this trains a per-class LM
and argmaxes ln P(c) + Σ m_t·ln P(t|c) (McCallum & Nigam '98).

Model.  Vocabulary = top ``vocab_size`` tokens CORPUS-WIDE by (count
DESC, token ASC) — deterministic cap shared across classes, bounding
the broadcast at any corpus size.  With per-class token counts c_tc
over the kept vocabulary, N_c = Σ_t c_tc, V = kept vocabulary size,
add-alpha smoothing over V+1 classes (the +1 absorbs OOV mass, the
L39 convention):

    ln P(t|c)   = ln(c_tc + alpha) − ln(N_c + alpha·(V+1))
    ln P(OOV|c) = ln(alpha)        − ln(N_c + alpha·(V+1))
    ln P(c)     = ln(docs_c) − ln(docs_total)

A vocab token absent from a class (c_tc = 0) scores exactly
ln P(OOV|c), so the (token × class) model table stays SPARSE — the
scoring join coalesces misses to the per-class OOV constant and is
correct without densifying.

Scale shape.  Training: one combinable ``groupBy(token)`` + TakeOrdered
top-V, one combinable ``groupBy(label, token)`` semi-joined to the
vocabulary — both single scans.  Scoring: (doc, token) multiplicities
(combinable) × the broadcast class table (a handful of rows) with the
broadcast sparse model left-joined — no shuffle grows with classes.

Determinism contract (DuckDB oracle): per-(doc, class) log-prob sums
are left-associative folds over token-sorted term lists on BOTH
engines (``array_sort``+``aggregate`` / ``list_sort``+``list_reduce``)
— the L39 discipline pinning float addend order; residual cross-engine
delta is libm-ulp in ``ln``.  Ties in the argmax break on label ASC;
class score margins are driven by count differences (≫ ulp), so the
prediction is stable.

No reference counterpart; curation/classification per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.dedup import _clean_tokens


def train_nb(
    corpus: DataFrame,
    label_col: str,
    text_col: str = "text",
    vocab_size: int = 65536,
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """``(model, classes)`` — ``model`` = (label, token, logp) for
    tokens PRESENT in the class (sparse); ``classes`` = (label,
    prior_lp, oov_lp).  Both bounded and broadcastable; the corpus is
    scanned twice (vocab cap, per-class counts), each scan combinable."""
    toks = corpus.select(
        F.col(label_col).alias("label"),
        F.explode(_clean_tokens(text_col)).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
    ).localCheckpoint()  # bounded <= vocab_size; freezes the cap scan
    v = vocab.count()

    per_class = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("label", "token")
        .agg(F.count(F.lit(1)).alias("c_tc"))
    ).localCheckpoint()  # bounded <= classes x vocab_size

    denom = F.log(F.col("n_c") + F.lit(float(alpha)) * (F.lit(float(v)) + 1.0))
    class_tok = per_class.groupBy("label").agg(
        F.sum("c_tc").cast("double").alias("n_c")
    )
    n_docs = corpus.count()
    doc_counts = corpus.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("docs_c")
    )
    classes = (
        doc_counts.join(F.broadcast(class_tok), "label", "left")
        .withColumn("n_c", F.coalesce(F.col("n_c"), F.lit(0.0)))
        .select(
            "label",
            (
                F.log(F.col("docs_c").cast("double"))
                - F.log(F.lit(float(n_docs)))
            ).alias("prior_lp"),
            (F.log(F.lit(float(alpha))) - denom).alias("oov_lp"),
        )
    )
    model = per_class.join(F.broadcast(class_tok), "label").select(
        "label",
        "token",
        (F.log(F.col("c_tc") + F.lit(float(alpha))) - denom).alias("logp"),
    )
    return model, classes


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, label, score)`` — ln P(c) + Σ m_t·ln P(t|c) for every
    (document × class); token-less documents score the prior alone
    (they flow through the fold as a single NULL-token 0.0 term via
    ``explode_outer``, so NO doc×class spine join is needed — the
    result is one broadcast prior join instead of a wide sort-merge)."""
    mult = (
        docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode_outer(_clean_tokens(text_col)).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    terms = (
        mult.crossJoin(F.broadcast(classes))
        .join(F.broadcast(model), ["label", "token"], "left")
        .select(
            "doc_id",
            "label",
            "token",
            F.when(F.col("token").isNull(), F.lit(0.0))
            .otherwise(
                F.col("m").cast("double")
                * F.coalesce(F.col("logp"), F.col("oov_lp"))
            )
            .alias("term"),
        )
    )
    folded = terms.groupBy("doc_id", "label").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("token", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("lp")
    )
    return folded.join(
        F.broadcast(classes.select("label", "prior_lp")), "label"
    ).select(
        "doc_id",
        "label",
        (F.col("prior_lp") + F.col("lp")).alias("score"),
    )


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, label, score)`` — the argmax class per document,
    ties broken by label ASC (deterministic)."""
    scored = nb_score(docs, model, classes, doc_id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
