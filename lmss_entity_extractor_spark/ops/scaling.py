"""Feature scaling (L143): z-score standardization, min-max scaling,
and percentile winsorization — the ML-preprocessing trio, each as
"one combinable fit aggregation + broadcast stats + per-row codegen
expressions" so a 100 TB table is scanned once to fit and once to
apply (or once total when the plan fuses them).

Exactness:
* standardize — mean = S/n and std = sqrt((n·Sxx − S²)/(n·(n−1)))
  from EXACT DECIMAL sums (L135 discipline) through a fixed IEEE tree;
  each z = (x − mean)/std is two more IEEE ops on identical operands
  ⇒ bit-identical, ungridded.  Zero-variance columns scale to NULL.
* min-max — min/max are order statistics (exact); (x − min)/(max − min)
  is a fixed tree; degenerate (max = min) → NULL.
* winsorize — clamp to DISCRETE percentile bounds (``percentile_disc``,
  actual data values, the L124/L137 convention) — output values are
  either the input or a bound, never an interpolation.

No reference counterpart; ML feature preparation per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _notnull_stats(df: DataFrame, aggs) -> DataFrame:
    return F.broadcast(df.agg(*aggs))


def standardize(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """``df`` + ``z_<c>`` per column (sample-std z-scores).  Columns
    must be exactly representable at ``DECIMAL(18, scale)``; NULL
    inputs give NULL z."""
    dec = f"decimal(18,{scale})"
    aggs = []
    for c in columns:
        cd = F.col(c).cast(dec)
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.sum(cd).alias(f"_s_{c}"),
            F.sum(cd * cd).alias(f"_ss_{c}"),
        ]
    out = df.crossJoin(_notnull_stats(df, aggs))
    for c in columns:
        n = F.col(f"_n_{c}").cast("double")
        s = F.col(f"_s_{c}").cast("double")
        ss = F.col(f"_ss_{c}").cast("double")
        mean = s / n
        var_n = n * ss - s * s
        std = F.sqrt(var_n / (n * (n - F.lit(1.0))))
        z = F.when(
            (F.col(f"_n_{c}") > 1) & (var_n > F.lit(0.0)),
            (F.col(c) - mean) / std,
        )
        out = out.withColumn(f"z_{c}", z)
    return out.drop(
        *[f"_{p}_{c}" for c in columns for p in ("n", "s", "ss")]
    )


def minmax_scale(df: DataFrame, columns: list[str]) -> DataFrame:
    """``df`` + ``mm_<c>`` per column: (x − min)/(max − min) in [0, 1];
    constant columns scale to NULL."""
    aggs = []
    for c in columns:
        aggs += [
            F.min(F.col(c)).alias(f"_lo_{c}"),
            F.max(F.col(c)).alias(f"_hi_{c}"),
        ]
    out = df.crossJoin(_notnull_stats(df, aggs))
    for c in columns:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        out = out.withColumn(
            f"mm_{c}",
            F.when(hi > lo, (F.col(c) - lo) / (hi - lo)),
        )
    return out.drop(*[f"_{p}_{c}" for c in columns for p in ("lo", "hi")])


def winsorize(
    df: DataFrame,
    columns: list[str],
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """``df`` + ``w_<c>`` per column: values clamped to the discrete
    [p_lo, p_hi] percentile bounds — every output is an actual input
    value (no interpolation), so the clamp is engine-exact."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    aggs = []
    for c in columns:
        aggs += [
            F.expr(
                f"percentile_disc({lo!r}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"_lo_{c}"),
            F.expr(
                f"percentile_disc({hi!r}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"_hi_{c}"),
        ]
    out = df.crossJoin(_notnull_stats(df, aggs))
    for c in columns:
        lo_b, hi_b = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        out = out.withColumn(
            f"w_{c}", F.least(F.greatest(F.col(c), lo_b), hi_b)
        )
    return out.drop(*[f"_{p}_{c}" for c in columns for p in ("lo", "hi")])


def quantile_normalize(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., order_cols..., value, qnorm)`` — cross-group quantile
    normalization (L346): force every group onto the SAME distribution
    (the mean order-statistic curve), the microarray/batch-effect
    remover — after it, rank r in any group has the identical value,
    so group comparisons see shape, never level or spread:

        rank within group by (value, order_cols…)   [deterministic]
        reference(r) = mean over groups of the r-th order statistic
        qnorm(row)   = reference(rank(row))

    Groups MUST be equal-sized (refused loudly otherwise — unequal
    sizes need rank interpolation, a different contract).  The
    reference is Σ(values at rank r)/G — exact decimal sum, ONE
    division; the rank join back is an equi-join on (rank), broadcast
    when the series is short.

    Scale shape: one keyed window + one rank groupBy + one equi-join.

    No reference counterpart; ML feature preparation per SURVEY §2.11.
    """
    from pyspark.sql import Window

    n_null = df.filter(F.col(value_col).isNull()).count()
    if n_null:
        raise ValueError(
            f"quantile_normalize: {n_null} NULL value(s) — impute first"
        )
    sizes = [
        r[0]
        for r in df.groupBy(*by)
        .count()
        .select("count")
        .distinct()
        .collect()
    ]
    if len(sizes) > 1:
        raise ValueError(
            "quantile_normalize: groups must be equal-sized, got sizes "
            f"{sorted(sizes)} — trim or interpolate first"
        )
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        F.col(value_col), *[F.col(c) for c in order_cols]
    )
    ranked = df.select(
        *by,
        *order_cols,
        F.col(value_col).cast(dec).alias("_v"),
        F.row_number().over(wt).alias("_r"),
    )
    ref = ranked.groupBy("_r").agg(
        F.sum("_v").alias("_s"),
        F.count(F.lit(1)).alias("_g"),
    )
    out = ranked.join(F.broadcast(ref), "_r")
    return out.select(
        *by,
        *order_cols,
        F.col("_v").cast("double").alias("value"),
        (
            F.col("_s").cast("double") / F.col("_g").cast("double")
        ).alias("qnorm"),
    )
