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
from .validate import validation_enabled


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
    if validation_enabled():
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


def vocab_coverage(
    df: DataFrame,
    term_col: str,
) -> DataFrame:
    """One row ``(n_tokens, n_types, f1, f2, chao1, unseen_mass,
    coverage)`` — nonparametric vocabulary-completeness estimates from
    the frequency-of-frequencies, the curation question Heaps' law
    (L179) fits a CURVE to answered with a POINT estimate instead:

      Chao1 richness (bias-corrected form, defined even at f2 = 0):
          chao1 = D + f1·(f1−1) / (2·(f2+1))
      Good-Turing unseen probability mass:
          unseen_mass = f1 / N,   coverage = 1 − f1/N

    with N total tokens, D distinct types, f1 singletons, f2
    doubletons.  All counts are exact integers from TWO combinable
    groupBys (term → count, count → frequency-of-frequencies); each
    estimate is one division of exact integers — bit-identical,
    ungridded.  N = 0 groups are absent (empty input → empty frame).

    Chao 1984; Good 1953.  Scale shape: the (term) groupBy is the
    same exchange every TF operator pays; the second groupBy runs on
    the bounded count-of-count table.  100 TB of tokens scans once.
    """
    dec = "decimal(38,0)"
    tf = (
        df.filter(F.col(term_col).isNotNull())
        .groupBy(F.col(term_col).alias("_t"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    fof = tf.groupBy("_c").agg(F.count(F.lit(1)).alias("_f"))
    agg = fof.agg(
        F.coalesce(
            F.sum(F.col("_c").cast(dec) * F.col("_f").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("n_tokens"),
        F.coalesce(F.sum("_f"), F.lit(0)).alias("n_types"),
        F.coalesce(
            F.sum(F.when(F.col("_c") == 1, F.col("_f"))), F.lit(0)
        ).alias("f1"),
        F.coalesce(
            F.sum(F.when(F.col("_c") == 2, F.col("_f"))), F.lit(0)
        ).alias("f2"),
    )
    f1d = F.col("f1").cast(dec)
    f2d = F.col("f2").cast(dec)
    chao1 = F.col("n_types").cast("double") + (
        f1d * (f1d - 1)
    ).cast("double") / (F.lit(2).cast(dec) * (f2d + 1)).cast("double")
    unseen = f1d.cast("double") / F.col("n_tokens").cast("double")
    return agg.filter(F.col("n_tokens") > 0).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_types",
        "f1",
        "f2",
        chao1.alias("chao1"),
        unseen.alias("unseen_mass"),
        (F.lit(1.0) - unseen).alias("coverage"),
    )
