"""Correlation analysis (L141/L142): Pearson correlation matrix over a
set of numeric columns and Spearman rank correlation — the standard
"which features move together" profile, re-expressed for cross-engine
bit-identity.

L141 — Pearson matrix: for every unordered column pair {x, y},

    corr = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))

from EXACT DECIMAL sufficient statistics (the L135 discipline) through
one fixed IEEE tree (sqrt exactly rounded ⇒ bit-identical, NO grid).
All p·(p+1)/2 pairs come out of ONE combinable aggregation over the
table — a 100 TB table is scanned once regardless of how many columns
are profiled.  Zero-variance columns yield NULL correlations.
Rows with a NULL in ANY profiled column are excluded (listwise
deletion — the convention that keeps every pair on the same n and the
matrix positive semi-definite).

L142 — Spearman: Pearson applied to fractional ranks (average-rank
ties), expressed as DOUBLED ranks (rank_min + rank_max — always an
exact integer, no .5 concerns), so the same decimal-exact Pearson
machinery applies.  The doubling cancels EXACTLY: the factor 4 scales
the numerator and each variance by an exact power of two, and IEEE
multiplication-by-4 / sqrt both commute with that scaling — so
corr(2u, 2v) is bit-identical to corr(u, v).  Ranking is NOT a global
row sort: ranks depend only on values, so each column ranks through
its value-count table (combinable groupBy + window over DISTINCT
values + join back) — the only ordered pass is over the bounded
distinct-value table, never the 100 TB of rows.

No reference counterpart; profiling analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pearson_from_decimal(stats_row_df: DataFrame, pairs) -> DataFrame:
    """Long-form (col_a, col_b, n, corr) from a 1-row sufficient-stat
    frame with columns n, s_<c>, ss_<c>_<c'> for every needed pair."""
    out = []
    for a, b in pairs:
        n = F.col("n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxx = F.col(f"ss_{a}_{a}").cast("double")
        syy = F.col(f"ss_{b}_{b}").cast("double")
        sxy = F.col(f"ss_{a}_{b}").cast("double")
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = F.when(
            (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
            (n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)),
        )
        out.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                corr.alias("corr"),
            )
        )
    return stats_row_df.select(
        F.explode(F.array(*out)).alias("p")
    ).select("p.col_a", "p.col_b", "p.n", "p.corr")


def corr_matrix(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """``(col_a, col_b, n, corr)`` — Pearson correlation for every
    unordered pair (col_a < col_b lexicographically).  Columns must be
    exactly representable at ``DECIMAL(18, scale)``."""
    if len(columns) < 2:
        raise ValueError(f"need >= 2 columns, got {columns}")
    dec = f"decimal(18,{scale})"
    cond = None
    for c in columns:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    vals = df.filter(cond)
    cols = sorted(columns)
    aggs = [F.count(F.lit(1)).alias("n")]
    pairs = []
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a).cast(dec)).alias(f"s_{a}"))
        aggs.append(
            F.sum(F.col(a).cast(dec) * F.col(a).cast(dec)).alias(
                f"ss_{a}_{a}"
            )
        )
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(
                    f"ss_{a}_{b}"
                )
            )
            pairs.append((a, b))
    return _pearson_from_decimal(vals.agg(*aggs), pairs)


def doubled_ranks(df: DataFrame, columns: list[str]) -> DataFrame:
    """``df`` with ``rk2_<c>`` = 2× the fractional (average-tie) rank
    of each column — 2·avg_rank = rank_min + rank_max = exact integer,
    so the Spearman input is integer-valued (decimal-exact at scale 0).

    NOT a global row sort: a rank depends only on the VALUE, so each
    column ranks via its value-count table (one combinable groupBy),
    a window over the DISTINCT values (orders of magnitude smaller
    than the rows), and an equi-join back — with rank_min = cum − cnt
    + 1, rk2 = 2·cum − cnt + 1.  Rows with any NULL are excluded
    first (listwise, matching :func:`corr_matrix`)."""
    cond = None
    for c in columns:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    out = df.filter(cond)
    for c in columns:
        counts = out.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked_vals = counts.select(
            "_v",
            (2 * F.sum("_cnt").over(w) - F.col("_cnt") + 1)
            .cast("long")
            .alias(f"rk2_{c}"),
        )
        out = out.join(ranked_vals, out[c] == ranked_vals["_v"]).drop("_v")
    return out


def spearman_corr(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """``(col_a, col_b, n, corr)`` — Spearman rank correlation for
    every unordered pair, exact under ties (average-rank method via
    doubled integer ranks; the doubling cancels in the statistic)."""
    ranked = doubled_ranks(df, columns)
    rcols = [f"rk2_{c}" for c in sorted(columns)]
    out = corr_matrix(ranked, rcols, scale=0)
    strip = F.regexp_replace(F.col("col_a"), "^rk2_", "")
    strip_b = F.regexp_replace(F.col("col_b"), "^rk2_", "")
    return out.select(
        strip.alias("col_a"), strip_b.alias("col_b"), "n", "corr"
    )
