"""Corpus scaling-law diagnostics (L179/L180): Heaps' law (vocabulary
growth V(N) ≈ K·N^β) and the Zipf rank-frequency fit (f(r) ≈ C·r^−s) —
the two numbers that say whether a text corpus behaves like natural
language (β ≈ 0.4-0.6, s ≈ 1) or like logs/boilerplate, and the text
twins of the graph power-law fit (L145).

Both are ln/ln OLS fits computed with the L145 ordered-fold
discipline: the point set is BOUNDED (Heaps: one point per document
in ingest order, guarded by ``max_points`` — sample documents
deterministically beyond that; Zipf: the top-k terms), the five
sufficient sums run as 0.0-prepended left-associative folds over the
sorted point list, and the fit is a fixed IEEE tree — the remaining
cross-engine delta is libm-ulp in ``ln``.

Relational shapes:
  * Heaps: tokens explode once; a term's FIRST document (min doc
    position) marks where it enters the vocabulary, so V_d is a
    window cumsum of new-term counts and N_d a cumsum of token counts
    — no running COUNT DISTINCT, one scan + two bounded windows.
  * Zipf: one combinable term count, TakeOrdered top-k, rank by
    (count DESC, term ASC) — deterministic ties.

No reference counterpart; corpus analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != F.lit(""),
    )


def _ols_fold(pts: DataFrame, x_col: str, y_col: str, order_col: str):
    """(n_points, alpha=−slope..., see powerlaw) over ln(x), ln(y)."""
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.log(F.col(x_col).cast("double")).alias("x"),
                F.log(F.col(y_col).cast("double")).alias("y"),
            )
        )
    )
    row = pts.agg(arr.alias("a")).select(
        F.size("a").cast("double").alias("n"),
        F.size("a").alias("n_points"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"]).alias("sx"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["y"]).alias("sy"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"] * p["x"]).alias("sxx"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"] * p["y"]).alias("sxy"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["y"] * p["y"]).alias("syy"),
    )
    n = F.col("n")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n_points") > 1) & (varx_n > F.lit(0.0))
    slope = cov_n / varx_n
    return row, ok, slope, cov_n, varx_n, vary_n, n


def heaps_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_points: int = 10000,
) -> DataFrame:
    """One row ``(n_points, beta, log_k, r2)`` — OLS of ln(V) on ln(N)
    over per-document (tokens-so-far, vocab-so-far) points in
    ``id_col`` order.  β is the Heaps exponent, K = exp(log_k).
    More than ``max_points`` documents is REFUSED (deterministically
    sample documents first — the fit stabilizes long before 10⁴)."""
    n_docs = docs.count()
    if n_docs > max_points:
        raise ValueError(
            f"heaps_fit: {n_docs} documents > max_points={max_points} — "
            "hash-sample documents first (ops.textprep.stratified_sample)"
        )
    toks = docs.select(
        F.col(id_col).alias("_d"), F.explode(_tokens(text_col)).alias("_t")
    )
    per_doc = toks.groupBy("_d").agg(F.count(F.lit(1)).alias("_nt"))
    firsts = (
        toks.groupBy("_t")
        .agg(F.min("_d").alias("_d"))
        .groupBy("_d")
        .agg(F.count(F.lit(1)).alias("_nv"))
    )
    w = Window.orderBy("_d").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_doc.join(firsts, "_d", "left")
        .select(
            "_d",
            F.sum("_nt").over(w).alias("N"),
            F.sum(F.coalesce(F.col("_nv"), F.lit(0))).over(w).alias("V"),
        )
        .filter((F.col("N") > 0) & (F.col("V") > 0))
    )
    row, ok, slope, cov_n, varx_n, vary_n, n = _ols_fold(pts, "N", "V", "_d")
    return row.select(
        "n_points",
        F.when(ok, slope).alias("beta"),
        F.when(ok, (F.col("sy") - slope * F.col("sx")) / n).alias("log_k"),
        F.when(
            ok & (vary_n > F.lit(0.0)), (cov_n * cov_n) / (varx_n * vary_n)
        ).alias("r2"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """One row ``(n_points, s, log_c, r2)`` — OLS of ln(freq) on
    ln(rank) over the top-``top_k`` terms (count DESC, term ASC rank —
    deterministic ties); s is the (positive) Zipf exponent."""
    counts = (
        docs.select(F.explode(_tokens(text_col)).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    ranked = counts.select(
        "_t",
        "_f",
        F.row_number()
        .over(Window.orderBy(F.col("_f").desc(), F.col("_t").asc()))
        .alias("_r"),
    ).filter(F.col("_r") <= top_k)
    row, ok, slope, cov_n, varx_n, vary_n, n = _ols_fold(ranked, "_r", "_f", "_r")
    return row.select(
        "n_points",
        F.when(ok, -slope).alias("s"),
        F.when(ok, (F.col("sy") - slope * F.col("sx")) / n).alias("log_c"),
        F.when(
            ok & (vary_n > F.lit(0.0)), (cov_n * cov_n) / (varx_n * vary_n)
        ).alias("r2"),
    )
