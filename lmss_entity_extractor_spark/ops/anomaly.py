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


def mahalanobis_2d(
    df: DataFrame,
    by: list[str],
    id_col: str,
    x_col: str,
    y_col: str,
    threshold: float = 9.21,
    scale: int = 4,
) -> DataFrame:
    """``(by..., id, x, y, md2, is_outlier)`` — bivariate Mahalanobis
    outlier distances (L335): points far from the cloud IN THE
    CLOUD'S OWN METRIC — the correlated-pair outlier screen that the
    univariate MAD (L137) cannot be (a point can be unremarkable on
    each axis and absurd jointly):

        md² = (v − μ)ᵀ Σ⁻¹ (v − μ),  Σ⁻¹ closed-form for 2×2

    (default threshold 9.21 = χ²₂ at 1%).  The covariance comes from
    exact decimal sufficient sums (the L141 discipline), inverts in
    closed form — no matrix library — and broadcasts back onto the
    rows (fit-small/apply-wide); md² is one fixed tree per row.
    Singular covariance (|Σ| ≤ 0: n < 3, a constant margin, or exact
    collinearity) → NULL md².

    Scale shape: ONE combinable agg + a broadcast join back — two
    narrow scans of 100 TB.

    No reference counterpart; anomaly analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    flt = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    stats = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(yd * yd).alias("_syy"),
        F.sum(xd * yd).alias("_sxy"),
    )
    joined = (
        flt.join(F.broadcast(stats), by)
        if by
        else flt.crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx = (nd * sxx - sx * sx) / (nd * (nd - F.lit(1.0)))
    vy = (nd * syy - sy * sy) / (nd * (nd - F.lit(1.0)))
    cv = (nd * sxy - sx * sy) / (nd * (nd - F.lit(1.0)))
    det = vx * vy - cv * cv
    dx = F.col(x_col).cast("double") - sx / nd
    dy = F.col(y_col).cast("double") - sy / nd
    md2 = (
        vy * dx * dx - F.lit(2.0) * cv * dx * dy + vx * dy * dy
    ) / det
    ok = (F.col("_n") >= 3) & (det > 0.0)
    return joined.select(
        *by,
        F.col(id_col).alias("id"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.when(ok, md2).alias("md2"),
        F.when(ok, md2 > F.lit(float(threshold))).alias(
            "is_outlier"
        ),
    )
