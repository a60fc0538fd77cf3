"""Power-law degree-distribution fit (L145): "is this graph
scale-free" — the first question asked of any constructed KG
(Barabási-Albert; heavy-tailed degree ⇒ hub-aware partitioning and
skew strategies matter).  Fits ln(n_k) = intercept − α·ln(k) by OLS
over the DISTINCT-DEGREE points and reports α and R² as the
conformance measure.

This is the log-log regression the decimal-sum trick (L135) cannot
reach — ln(k) is an arbitrary double, so a float ``SUM`` over points
would be partition-order-dependent.  The point set is BOUNDED (one
row per distinct degree — thousands at worst for a 100 TB graph), so
the five sufficient sums run as 0.0-prepended left-associative folds
over the degree-sorted point list (the L39 ordered-fold discipline):
every addend order is pinned, the remaining cross-engine delta is
libm-ulp in ``ln``.

Scale: degrees = one combinable groupBy over edge endpoints;
the distribution = a second combinable groupBy (bounded output);
the fit = one single-row aggregation over the bounded point list.
The 100 TB edge list is scanned once.

No reference counterpart; graph diagnostics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(k, n_k)`` — total-degree histogram (each endpoint occurrence
    counts; self-loops count twice, the multigraph convention)."""
    ends = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("k"))
    return deg.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))


def power_law_fit(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_degree: int = 1,
) -> DataFrame:
    """One row ``(n_points, alpha, intercept, r2)`` — OLS of ln(n_k)
    on ln(k) over distinct degrees ≥ ``min_degree``; α = −slope.
    Fewer than 2 points (or zero x-variance) yields NULL fit fields."""
    pts = degree_distribution(edges, src, dst).filter(
        F.col("k") >= min_degree
    )
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("k").alias("k"),
                F.log(F.col("k").cast("double")).alias("x"),
                F.log(F.col("n_k").cast("double")).alias("y"),
            )
        )
    )
    row = pts.agg(arr.alias("a")).select(
        F.size("a").cast("double").alias("n"),
        F.size("a").alias("n_points"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"]).alias("sx"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["y"]).alias("sy"),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"] * p["x"]).alias(
            "sxx"
        ),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["x"] * p["y"]).alias(
            "sxy"
        ),
        F.aggregate("a", F.lit(0.0), lambda s, p: s + p["y"] * p["y"]).alias(
            "syy"
        ),
    )
    n = F.col("n")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n_points") > 1) & (varx_n > F.lit(0.0))
    slope = cov_n / varx_n
    return row.select(
        "n_points",
        F.when(ok, -slope).alias("alpha"),
        F.when(ok, (F.col("sy") - slope * F.col("sx")) / n).alias(
            "intercept"
        ),
        F.when(
            ok & (vary_n > F.lit(0.0)),
            (cov_n * cov_n) / (varx_n * vary_n),
        ).alias("r2"),
    )
