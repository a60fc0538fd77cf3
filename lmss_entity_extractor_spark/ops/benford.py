"""Benford's-law conformance test (L144): the forensic data-quality
check — do leading digits of a naturally-occurring numeric column
follow log10(1 + 1/d)?  Fabricated, truncated, or unit-capped data
visibly deviates (Nigrini's fraud/auditing standard); on a pipeline it
flags synthetic or clipped columns before they poison downstream
statistics.

Semantics: leading digit of |x| for rows with |x| ≥ 1 (values in
(0, 1) have a leading significant digit too, but extracting it needs
log10/pow on every row; the ≥ 1 convention keeps the digit a pure
STRING operation — documented, and the oracle mirrors it).  Output is
one row per digit 1..9: observed count, observed share, expected
Benford share, and the absolute deviation; plus the chi-squared
statistic per row (identical value repeated would be redundant — the
caller sums (o−e)²/e terms if wanted; we emit the per-digit term).

Exactness: counts are exact integers; the digit is a substring (no
float path); shares are single IEEE divisions; expected = log10(1 +
1/d) on literal d (libm, same both engines); the (o−e)²/e term is a
fixed tree.  Ungridded.

Scale: leading-digit extraction is one narrow projection; the tally
is a combinable 9-bucket groupBy — the cheapest possible shape.

No reference counterpart; data-quality forensics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_digits(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """``(digit, n, share, expected, abs_dev, chi2_term)`` for digits
    1..9 over rows with |value| ≥ 1 (NULLs excluded).  Digits absent
    from the data still appear (n = 0) — a missing digit is the
    strongest possible deviation, not an absent row."""
    spark = df.sparkSession
    digits = F.broadcast(
        spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    )
    lead = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.abs(F.col(value_col)).alias("v"))
        .filter(F.col("v") >= 1)
        .select(
            # floor-then-string: a decimal CAST would ROUND (9.5 -> 10,
            # leading digit read as 1); floor(double) -> LONG is loud
            # on overflow under ANSI and never prints scientific form
            F.substring(F.floor(F.col("v")).cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = lead.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    out = (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "total",
        )
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    dev = F.abs(share - expected)
    e_cnt = expected * F.col("total").cast("double")
    chi2_term = (
        (F.col("n").cast("double") - e_cnt)
        * (F.col("n").cast("double") - e_cnt)
        / e_cnt
    )
    return out.select(
        "digit",
        "n",
        share.alias("share"),
        expected.alias("expected"),
        dev.alias("abs_dev"),
        chi2_term.alias("chi2_term"),
    )
