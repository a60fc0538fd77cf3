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

from pyspark.sql import DataFrame
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
