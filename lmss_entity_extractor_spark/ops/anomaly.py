"""Robust anomaly detection (L137): per-group median/MAD outlier
flags — the distribution-free quality monitor ("which event values are
wild, per type") that complements L131's PSI (population drift) with a
per-ROW signal (Hampel identifier / robust z-score, Leys et al. 2013).

Semantics: per group, med = the DISCRETE median of ``value`` (ANSI
``percentile_disc`` — an order statistic, i.e. an actual data value,
never an interpolation), mad = the discrete median of |value − med|;
a row is an outlier iff |value − med| > k·mad.  Degenerate tight
groups (mad = 0) flag EVERY deviation from the median — documented
convention (the alternative, flagging nothing, hides wild rows in
constant-valued groups).

Exactness: order statistics are engine-exact (no float summation at
all — the L124 ``percentile_disc``/``quantile_disc`` agreement), the
deviation is one IEEE subtraction, and the threshold one multiply —
so flags and published med/mad hash-match the oracle with no grid.

Scale shape: two combinable order-statistic aggregations + two
equi-joins back, all on the SAME group key — the shuffles co-locate
and nothing is quadratic; group count bounds the joined stat tables.

No reference counterpart; quality-monitoring analytics per SURVEY
§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """``(df.*, med, mad, is_outlier)`` — per-group robust flags.
    NULL values are excluded from the statistics and flagged NULL."""
    gb = [F.col(c) for c in group_cols]
    vals = df.filter(F.col(value_col).isNotNull())
    med = vals.groupBy(*gb).agg(
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("med")
    )
    dev = vals.join(med, group_cols).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*gb).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _dev)").alias(
            "mad"
        )
    )
    flagged = dev.join(mad, group_cols).withColumn(
        "is_outlier", F.col("_dev") > F.lit(float(k)) * F.col("mad")
    )
    return flagged.drop("_dev")
