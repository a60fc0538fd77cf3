"""Equi-depth binning (L124): fit per-column quantile boundaries once,
apply them to any data forever — the fit/transform featurizer shape
(quantile bucketing for feature discretization, score calibration,
monotone binning) as two separate concerns:

* ``fit_equidepth_bins`` — the n−1 interior boundaries as ONE
  aggregate over one scan.  ``accuracy="exact"`` uses
  ``percentile_disc`` (ANSI discrete quantile — verified to agree with
  DuckDB's ``quantile_disc`` value-for-value, which is what makes the
  contract query a VALUE oracle); exact percentiles buffer the column
  per partition, so for 100 TB fits use ``accuracy="approx"``
  (``approx_percentile``, Greenwald-Khanna sketch, bounded memory) —
  the documented exact-vs-sketch trade, same stance as the L23/L103
  exact-distinct contract.
* ``apply_bins`` — bucket id as a pure column expression: the count of
  boundaries strictly below the value, folded over the (tiny,
  plan-embedded) boundary array.  No join, no shuffle, applies to data
  the fit never saw (the artifact property that separates this from a
  per-row ``ntile``: ntile re-ranks every dataset it touches and gives
  the same row different buckets as the data around it changes;
  boundaries are FROZEN).

Boundaries are right-inclusive: bucket b covers
(bound[b-1], bound[b]], bucket 0 is (-inf, bound[0]], the last bucket
is open above — NULLs map to NULL bucket.  With heavy duplicate mass a
boundary can repeat; duplicates are collapsed and the realized bucket
count published honestly rather than padding degenerate empty buckets.

No reference counterpart; featurization hygiene per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fit_equidepth_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    accuracy: str = "exact",
) -> list[float]:
    """The deduplicated interior boundaries (ascending, at most
    n_bins−1 values) for ``n_bins`` equi-depth buckets of ``col``."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if accuracy not in ("exact", "approx"):
        raise ValueError(f"accuracy must be exact|approx, got {accuracy!r}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in DataFrame")
    fracs = [k / n_bins for k in range(1, n_bins)]
    if accuracy == "exact":
        exprs = [
            F.expr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY {col})"
            ).alias(f"b{k}")
            for k, f in enumerate(fracs)
        ]
    else:
        exprs = [
            F.percentile_approx(col, f, 10000).alias(f"b{k}")
            for k, f in enumerate(fracs)
        ]
    row = df.filter(F.col(col).isNotNull()).agg(*exprs).collect()[0]
    bounds: list[float] = []
    for k in range(len(fracs)):
        v = row[f"b{k}"]
        if v is None:
            raise ValueError(f"cannot fit bins: column {col!r} has no non-null rows")
        fv = float(v)
        if not bounds or fv > bounds[-1]:
            bounds.append(fv)
    return bounds


def bin_expr(col: Column, bounds: list[float]) -> Column:
    """Bucket id for ``col`` under frozen ``bounds``: the number of
    boundaries strictly below the value (right-inclusive buckets);
    NULL in → NULL out."""
    if not bounds:
        raise ValueError("bounds must be non-empty")
    if sorted(bounds) != list(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError("bounds must be strictly ascending")
    b = F.lit([float(x) for x in bounds])
    n = F.aggregate(
        b,
        F.lit(0),
        lambda acc, x: acc + F.when(col > x, 1).otherwise(0),
    )
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(n)


def apply_bins(
    df: DataFrame, col: str, bounds: list[float], out_col: str = "bucket"
) -> DataFrame:
    """Append ``out_col`` = frozen-boundary bucket id of ``col``."""
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in DataFrame")
    return df.withColumn(out_col, bin_expr(F.col(col), bounds))
