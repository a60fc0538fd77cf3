"""Privacy risk audit (L169): k-anonymity and l-diversity over a set
of quasi-identifier columns — the release gate that pairs with the PII
scrub (L15) and GDPR delete (L90): AFTER scrubbing direct identifiers,
can rows still be re-identified by combining quasi-identifiers (zip ×
age × segment), and do small groups leak the sensitive value?

k-anonymity: every quasi-identifier combination must cover ≥ k rows.
l-diversity: every combination must contain ≥ l DISTINCT sensitive
values (a k-anonymous group whose sensitive value is constant still
leaks it).

Everything is exact integer counting — one combinable groupBy with a
count and a count_distinct, flags as integer comparisons.  NULL quasi
values form their own group (a NULL zip is itself a quasi-identifier
value).  ``summarize`` folds the audit to one row (min k, min l,
violating-group counts) for a release-gate check.

Scale shape: one hash aggregation over the fact table (count_distinct
adds a partial-dedup pass); 100 TB scanned once.

No reference counterpart; governance/curation per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k_min: int = 5,
    l_min: int = 2,
) -> DataFrame:
    """``(quasi..., n, l, ok_k, ok_l)`` — one row per quasi-identifier
    combination with its size, sensitive diversity, and pass flags."""
    if not quasi_cols:
        raise ValueError("k_anonymity_audit: quasi_cols must be non-empty")
    agg = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(sensitive_col)).alias("l"),
    )
    return agg.select(
        *quasi_cols,
        "n",
        "l",
        (F.col("n") >= k_min).alias("ok_k"),
        (F.col("l") >= l_min).alias("ok_l"),
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k_min: int = 5,
    l_min: int = 2,
) -> DataFrame:
    """One row ``(n_groups, min_k, min_l, n_below_k, n_below_l,
    n_rows_at_risk)`` — the release-gate scalar view."""
    audit = k_anonymity_audit(df, quasi_cols, sensitive_col, k_min, l_min)
    return audit.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("min_k"),
        F.min("l").alias("min_l"),
        F.sum((~F.col("ok_k")).cast("long")).alias("n_below_k"),
        F.sum((~F.col("ok_l")).cast("long")).alias("n_below_l"),
        F.sum(F.when(~F.col("ok_k") | ~F.col("ok_l"), F.col("n")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """``(quasi..., n, m, emd_ordered, tvd)`` — the t-closeness audit
    (Li, Li & Venkatasubramanian 2007), the release gate k-anonymity
    (L169) cannot provide: a class can be large AND diverse yet still
    leak if its sensitive DISTRIBUTION differs from the table's.  Per
    quasi-identifier class, two distances to the global distribution
    over the m global distinct sensitive values (callers pre-bucket
    numerics, the L174 convention):

      ordered EMD (the paper's numeric-attribute distance; values as
      equally-spaced ranks) — with class counts c_j (n total) and
      global counts g_j (N total):

          emd = Σ_{i<m} |cumc_i·N − cumg_i·n| / (n·N·(m−1))

      total variation (the categorical distance):

          tvd = Σ_j |c_j·N − g_j·n| / (2·n·N)

    Both numerators are exact DECIMAL(38,0) integer sums (the L147 KS
    discipline — cross-multiplied cumulative gaps, order-insensitive),
    each statistic ONE IEEE division: bit-identical, ungridded.
    m < 2 yields NULL emd_ordered (no ladder to walk).

    Scale shape: one combinable (quasi, value) groupBy; the audit
    grid is (classes × m) built from a broadcast of the bounded
    global value ladder; one keyed window per class; one combinable
    agg.  100 TB scans once.
    """
    dec = "decimal(38,0)"
    base = df.filter(F.col(sensitive_col).isNotNull()).select(
        *quasi_cols, F.col(sensitive_col).alias("_v")
    )
    cells = base.groupBy(*quasi_cols, "_v").agg(
        F.count(F.lit(1)).alias("_c")
    )
    gl = cells.groupBy("_v").agg(F.sum("_c").alias("_g"))
    w_g = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gl = gl.select(
        "_v",
        "_g",
        F.sum("_g").over(w_g).alias("_cumg"),
        F.sum("_g").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_ntot"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("m"),
    )
    classes = cells.groupBy(*quasi_cols).agg(F.sum("_c").alias("n"))
    grid = (
        classes.crossJoin(F.broadcast(gl))
        .join(cells, [*quasi_cols, "_v"], "left")
        .select(
            *quasi_cols,
            "n",
            "m",
            "_v",
            "_g",
            "_cumg",
            "_ntot",
            F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
        )
    )
    w_c = (
        Window.partitionBy(*quasi_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn("_cumc", F.sum("_c").over(w_c))
    nd = F.col("n").cast(dec)
    ntd = F.col("_ntot").cast(dec)
    gap_cum = F.abs(
        F.col("_cumc").cast(dec) * ntd - F.col("_cumg").cast(dec) * nd
    )
    gap_pt = F.abs(
        F.col("_c").cast(dec) * ntd - F.col("_g").cast(dec) * nd
    )
    # the EMD ladder walks the m-1 INTERIOR cumulative gaps; the final
    # cumulative gap is identically 0, so summing all m is equivalent
    agg = grid.groupBy(*quasi_cols, "n", "m", "_ntot").agg(
        F.sum(gap_cum).alias("_semd"),
        F.sum(gap_pt).alias("_stvd"),
    )
    denom = (
        F.col("n").cast(dec)
        * F.col("_ntot").cast(dec)
        * (F.col("m").cast(dec) - 1)
    )
    denom_tvd = (
        F.lit(2).cast(dec) * F.col("n").cast(dec) * F.col("_ntot").cast(dec)
    )
    return agg.select(
        *quasi_cols,
        "n",
        "m",
        F.when(
            F.col("m") >= 2,
            F.col("_semd").cast("double") / denom.cast("double"),
        ).alias("emd_ordered"),
        (F.col("_stvd").cast("double") / denom_tvd.cast("double")).alias(
            "tvd"
        ),
    )
