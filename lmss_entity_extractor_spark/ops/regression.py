"""Grouped linear regression (L135): per-group OLS trendlines —
slope / intercept / R² — from combinable sufficient statistics, the
ANSI-SQL ``REGR_SLOPE`` family re-expressed for cross-engine
bit-identity ("is revenue trending with quantity, per segment" — the
classic warehouse trendline op).

Exactness discipline: float SUMs are order-dependent across engines,
so the sufficient statistics are summed as DECIMAL — inputs cast to
``DECIMAL(18, scale)`` (exact for cents-style data), products widen to
``DECIMAL(37, 2·scale)``, sums to ``DECIMAL(38, ·)`` — all EXACT and
order-insensitive, so any partition order and any engine produce the
same six numbers.  Only then does each statistic cast to double
(IEEE round-to-nearest, deterministic) and flow through ONE fixed
expression tree:

    slope     = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    intercept = (Sy − slope·Sx) / n
    r²        = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)·(n·Syy − Sy²))

— a handful of IEEE-specified ops on identical operands ⇒ bit-identical
on Spark and the DuckDB oracle with NO rounding grid.  Degenerate
groups (zero x-variance, incl. n = 1) yield NULL slope/intercept/r²
rather than ±inf; zero y-variance yields NULL r² (vertical fit is
exact but undefined correlation).

Scale: one map-side-combinable groupBy over six sums — the cheapest
possible shape; a 100 TB table is scanned once with no wide rows.
Overflow is loud: Spark runs ANSI mode, so a DECIMAL(38) sum overflow
fails the job rather than silently wrapping.

No reference counterpart; warehouse analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x: str,
    y: str,
    scale: int = 2,
) -> DataFrame:
    """``(group_cols..., n, slope, intercept, r2)`` — OLS of ``y`` on
    ``x`` per group.  ``x``/``y`` must be exactly representable at
    ``DECIMAL(18, scale)`` (e.g. integer quantities, cent-valued
    prices at the default scale=2) — that is what makes the sums, and
    therefore the fit, bit-identical across engines and partitionings.
    Rows where either side is NULL are excluded (REGR_* semantics)."""
    dec = f"decimal(18,{scale})"
    xd = F.col(x).cast(dec)
    yd = F.col(y).cast(dec)
    stats = (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(yd * yd).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.when(varx_n != F.lit(0.0), cov_n / varx_n)
    intercept = F.when(
        varx_n != F.lit(0.0), (sy - (cov_n / varx_n) * sx) / n
    )
    r2 = F.when(
        (varx_n != F.lit(0.0)) & (vary_n != F.lit(0.0)),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    return stats.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
