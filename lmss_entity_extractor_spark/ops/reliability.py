"""Weibull median-rank regression (L396): per-group (shape, scale)
reliability fit over COMPLETE failure-time samples — the lifetime-
distribution member of the fit family (Gumbel L309 fits block maxima
by moments, GPD L311 fits tails, KM L159 handles censoring
nonparametrically; Weibull MRR is the engineering standard for "what
is our failure law", Abernethy's New Weibull Handbook method):

    Fᵢ = (i − 0.3)/(n + 0.4)          (Bernard median ranks)
    yᵢ = ln(−ln(1 − Fᵢ)),  xᵢ = ln tᵢ  over t ASCENDING
    OLS y on x  →  shape k = slope,  scale λ = exp(−b/k)

The per-point transcendentals ride a BOUNDED sorted fold: each group
collapses to one value-sorted array (``max_len`` REFUSED loudly
beyond — the L180 contract) and the five OLS sums accumulate in
pinned ascending-rank order, so both engines build the identical
IEEE sums; every Fᵢ numerator/denominator is the same fixed tree
((i − 0.3)/(n + 0.4), pinned literals).  Duplicate failure times are
safe: the sorted multiset is deterministic and equal t's differ only
in rank i, which the fold assigns in the same pinned order.

Non-positive times are REFUSED (ln; a zero lifetime is a data bug),
NULLs ignored.  n < 2 or zero x-variance → NULL fit; a non-positive
fitted slope (decreasing empirical CDF — impossible unless the data
is degenerate) → NULL shape/scale, documented.  r² reported so
"Weibull doesn't fit" is visible (the plot-linearity check, made a
number).

Scale shape: one keyed exchange packing each bounded group + one
in-row fold; groups parallelize.

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def weibull_fit(
    df: DataFrame,
    by: list[str],
    value_col: str,
    max_len: int = 10_000,
) -> DataFrame:
    """``(by..., n, shape, scale, r2)`` — see module docstring."""
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).cast("double").alias("_t")
    )
    if validation_enabled():
        n_bad = flt.filter(F.col("_t") <= 0).count()
        if n_bad:
            raise ValueError(
                f"weibull_fit: {n_bad} non-positive lifetime(s) in "
                f"{value_col!r} — ln is undefined; a zero lifetime is a "
                "data bug"
            )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"weibull_fit: at least one group exceeds max_len="
                f"{max_len} — sample or shard first (the fit stabilizes "
                "long before 10^4 points)"
            )
    packed = flt.groupBy(*by).agg(
        F.sort_array(F.collect_list("_t")).alias("_xs")
    )
    n = F.size("_xs")
    nd = n.cast("double")

    def sums(term):
        return F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0.0), lambda acc, i: acc + term(i)
        )

    def x_of(i):
        return F.log(F.element_at(F.col("_xs"), i))

    def y_of(i):
        fi = (i.cast("double") - F.lit(0.3)) / (nd + F.lit(0.4))
        return F.log(-F.log(F.lit(1.0) - fi))

    staged = packed.select(
        *by,
        n.alias("n"),
        nd.alias("_nd"),
        sums(lambda i: x_of(i)).alias("_sx"),
        sums(lambda i: y_of(i)).alias("_sy"),
        sums(lambda i: x_of(i) * x_of(i)).alias("_sxx"),
        sums(lambda i: x_of(i) * y_of(i)).alias("_sxy"),
        sums(lambda i: y_of(i) * y_of(i)).alias("_syy"),
    )
    ndc = F.col("_nd")
    cov_n = ndc * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = ndc * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = ndc * F.col("_syy") - F.col("_sy") * F.col("_sy")
    ok = (F.col("n") > 1) & (varx_n > F.lit(0.0))
    slope = cov_n / varx_n
    b = (F.col("_sy") - slope * F.col("_sx")) / ndc
    return staged.select(
        *by,
        "n",
        F.when(ok & (slope > 0.0), slope).alias("shape"),
        F.when(ok & (slope > 0.0), F.exp(-b / slope)).alias("scale"),
        F.when(
            ok & (vary_n > F.lit(0.0)),
            (cov_n * cov_n) / (varx_n * vary_n),
        ).alias("r2"),
    )
