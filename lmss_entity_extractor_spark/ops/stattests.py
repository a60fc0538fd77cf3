"""Statistical hypothesis tests (L139/L140): Welch's unequal-variance
t-test for A/B metric comparison and the chi-squared independence test
for categorical association — the two workhorse significance tests of
experiment analysis and data-quality monitoring, re-expressed for
cross-engine bit-identity.

L139 — Welch's t (Welch 1947): per analysis group, compare metric
means of two named variants:

    t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
    df = (v_a/n_a + v_b/n_b)² /
         ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

with m = S/n and v = (n·Sxx − S²)/(n·(n−1)) from EXACT DECIMAL
sufficient statistics (the L135 discipline: order-insensitive sums,
then one fixed IEEE tree — ``sqrt`` is exactly rounded, so the whole
statistic is bit-identical, NO grid).  Variants with n < 2 or zero
pooled standard error yield NULL t/df rather than ±inf.  p-values
need the incomplete beta function (not IEEE-specified) — deliberately
NOT emitted; compare |t| against the caller's critical value.

L140 — chi-squared independence (Pearson): for two categoricals,
χ² = Σ_cells (o − e)²/e with e = row_total·col_total/N.  Counts are
exact integers; each cell term is a fixed tree; the CELL SUM is the
repo's ordered-fold discipline (sorted cell keys, 0.0-prepended
left-assoc fold) since cell count r·c is bounded while float ``SUM``
order is not.  dof = (r−1)(c−1).

Scale shape: both tests are single combinable aggregations over the
fact table (plus bounded margin joins for χ²) — one scan of 100 TB,
stat tables bounded by group/category cardinality.

No reference counterpart; experiment analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_ttest(
    df: DataFrame,
    by: list[str],
    variant_col: str,
    variant_a: str,
    variant_b: str,
    metric_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_a, n_b, mean_a, mean_b, t, dof)`` — Welch's t per
    analysis group.  The metric must be exactly representable at
    ``DECIMAL(18, scale)``; rows of other variants are ignored."""
    dec = f"decimal(18,{scale})"
    yd = F.col(metric_col).cast(dec)
    flt = df.filter(
        F.col(metric_col).isNotNull()
        & F.col(variant_col).isin([variant_a, variant_b])
    )

    def _side(tag, variant):
        return (
            flt.filter(F.col(variant_col) == variant)
            .groupBy(*by)
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(yd).alias(f"s_{tag}"),
                F.sum(yd * yd).alias(f"sxx_{tag}"),
            )
        )

    j = _side("a", variant_a).join(_side("b", variant_b), by, "full_outer")

    def _stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        mean = s / n
        var = (n * sxx - s * s) / (n * (n - F.lit(1.0)))
        return n, mean, var

    na, ma, va = _stats("a")
    nb, mb, vb = _stats("b")
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - F.lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
    )
    ok = (
        F.col("n_a").isNotNull()
        & F.col("n_b").isNotNull()
        & (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & (se2 > F.lit(0.0))
    )
    return j.select(
        *by,
        F.col("n_a"),
        F.col("n_b"),
        F.when(F.col("n_a").isNotNull(), ma).alias("mean_a"),
        F.when(F.col("n_b").isNotNull(), mb).alias("mean_b"),
        F.when(ok, t).alias("t"),
        F.when(ok, dof).alias("dof"),
    )


def chi2_independence(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row ``(chi2, dof, n)`` — Pearson's χ² of independence
    between two categorical columns (NULL categories excluded).
    The cell sum is an ordered fold, so the double is engine-stable."""
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = flt.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct(F.col("x")).alias("r"),
        F.count_distinct(F.col("y")).alias("c"),
    )
    terms = (
        cells.join(F.broadcast(rows), "x")
        .join(F.broadcast(cols), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "r",
            "c",
            "x",
            "y",
            (
                (
                    F.col("o").cast("double")
                    - (F.col("rt") * F.col("ct")).cast("double")
                    / F.col("n").cast("double")
                )
                * (
                    F.col("o").cast("double")
                    - (F.col("rt") * F.col("ct")).cast("double")
                    / F.col("n").cast("double")
                )
                / (
                    (F.col("rt") * F.col("ct")).cast("double")
                    / F.col("n").cast("double")
                )
            ).alias("term"),
        )
    )
    return terms.groupBy("n", "r", "c").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("x", "y", "term"))),
            F.lit(0.0),
            lambda acc, v: acc + v["term"],
        ).alias("chi2")
    ).select(
        "chi2",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.col("n"),
    )
