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
from .validate import validation_enabled


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

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"quantile_normalize: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
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


def boxcox_grid(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
    max_distinct: int = 10_000,
) -> DataFrame:
    """``(by..., n, ll_m1, ll_m05, ll_0, ll_05, ll_1, lambda_best)``
    — Box-Cox profile log-likelihood over the canonical λ grid
    {−1, −½, 0, ½, 1} (L357): WHICH power transform makes a positive
    metric most normal — reciprocal, inverse-root, log, root, or
    leave-it-alone — the pre-modeling decision L266/L352 only
    diagnose:

        y(λ) = (xᵏ−1)/λ   (λ≠0),   y(0) = ln x
        LL(λ) = −(n/2)·ln σ̂²_{y(λ)} + (λ−1)·Σ ln x

    Exactness at the fold boundary: values quantize to
    DECIMAL(18, scale) and collapse to (value, count) cells, so the
    double accumulations run over ONE deterministic sorted cell list
    per key — identical fold order in both engines (the L333
    discipline), with the grid's powers expressed via sqrt/division
    only (no libm pow).  Keys with more than ``max_distinct`` cells
    are REFUSED loudly (bin first — a profile likelihood over 10⁹
    distinct doubles is a different algorithm).  NULLs and
    non-positive values refused (Box-Cox is undefined there);
    zero-variance keys → NULL panel.  Ties in LL resolve to the
    SMALLEST λ (simplest transform wins).

    Scale shape: one cell groupBy + one keyed collect (bounded) +
    one in-array fold.

    No reference counterpart; ML feature preparation per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"boxcox_grid: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        n_bad = df.filter(F.col(value_col) <= 0).count()
        if n_bad:
            raise ValueError(
                f"boxcox_grid: {n_bad} non-positive value(s) — Box-Cox "
                "needs x > 0 (shift or drop first)"
            )
    dec = f"decimal(18,{scale})"
    cells = (
        df.select(*by, F.col(value_col).cast(dec).alias("_v"))
        .groupBy(*by, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if validation_enabled():
        over = (
            cells.groupBy(*by)
            .count()
            .filter(F.col("count") > max_distinct)
            .count()
        )
        if over:
            raise ValueError(
                f"boxcox_grid: at least one key exceeds max_distinct="
                f"{max_distinct} cells — bin/round first"
            )
    packed = cells.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_v"), F.col("_c")))
        ).alias("_a"),
        F.sum("_c").alias("n"),
    )
    zero = F.lit(0.0)
    fields = [
        "sy_m1", "syy_m1", "sy_mh", "syy_mh", "sy_0", "syy_0",
        "sy_h", "syy_h", "sy_1", "syy_1", "slog",
    ]
    init = F.struct(*[zero.alias(f) for f in fields])

    def step(acc, el):
        v = el["_v"].cast("double")
        c = el["_c"].cast("double")
        one = F.lit(1.0)
        y_m1 = (one / v - one) / F.lit(-1.0)
        y_mh = (one / F.sqrt(v) - one) / F.lit(-0.5)
        y_0 = F.log(v)
        y_h = (F.sqrt(v) - one) / F.lit(0.5)
        y_1 = v - one
        ys = [y_m1, y_mh, y_0, y_h, y_1]
        parts = []
        for i, y in enumerate(ys):
            parts.append(
                (acc[fields[2 * i]] + c * y).alias(fields[2 * i])
            )
            parts.append(
                (acc[fields[2 * i + 1]] + c * (y * y)).alias(
                    fields[2 * i + 1]
                )
            )
        parts.append((acc["slog"] + c * F.log(v)).alias("slog"))
        return F.struct(*parts)

    acc = F.aggregate(F.col("_a"), init, step)
    staged = packed.select(*by, "n", acc.alias("_f"))
    nd = F.col("n").cast("double")
    lambdas = [-1.0, -0.5, 0.0, 0.5, 1.0]
    names = ["ll_m1", "ll_m05", "ll_0", "ll_05", "ll_1"]
    m2s, lls = [], []
    for i, lam in enumerate(lambdas):
        sy = F.col("_f")[fields[2 * i]]
        syy = F.col("_f")[fields[2 * i + 1]]
        m2 = syy / nd - (sy / nd) * (sy / nd)
        m2s.append(m2)
        lls.append(
            -(nd / F.lit(2.0)) * F.log(m2)
            + F.lit(lam - 1.0) * F.col("_f")["slog"]
        )
    ok = F.col("n") >= 2
    for m2 in m2s:
        ok = ok & (m2 > 0.0)
    s2 = staged.select(
        *by, "n", ok.alias("_ok"),
        *[ll.alias(nm) for ll, nm in zip(lls, names)],
    )
    best = F.greatest(*[F.col(nm) for nm in names])
    lam_best = F.when(F.col(names[0]) == best, F.lit(-1.0))
    for nm, lam in zip(names[1:], lambdas[1:]):
        lam_best = lam_best.when(F.col(nm) == best, F.lit(lam))
    return s2.select(
        *by,
        "n",
        *[
            F.when(F.col("_ok"), F.col(nm)).alias(nm)
            for nm in names
        ],
        F.when(F.col("_ok"), lam_best).alias("lambda_best"),
    )
