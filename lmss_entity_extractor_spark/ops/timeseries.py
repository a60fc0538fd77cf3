"""Per-key time-series smoothing: exponentially weighted moving
average (EWMA) as ONE window expression — no recursion, no UDF, no
iterative loop.

The recurrence e_t = (1−α)·e_{t−1} + α·x_t looks inherently
sequential, but it has a prefix-sum closed form: with r = 1−α and the
in-key row index t (0-based),

    e_t = ( α·Σ_{i≤t} x_i·r^{−i}  +  (1−α)·x_0 ) · r^t
        —— rearranged below to avoid r^{−i} overflow by indexing from
        the row itself: P_t = Σ_{i≤t} x_i·(1/r)^i grows as (1/r)^t, so
        we fold the r^t back in per row: e_t = α·r^t·P_t + r^t·(1−α)·x_0
        ... which for α = 1/2 simplifies to e_t = (P_t + x_0) / 2^{t+1}
        with P_t = Σ x_i·2^i — every term DYADIC, so the whole operator
        is float-EXACT for integer inputs (bit-identical on any IEEE
        engine; this is what makes the α=1/2 contract query value-
        oracle-able with no rounding grid).

For general α the same shape applies with pow() terms; the growth of
(1/r)^t bounds the usable series length per key (doc'd loudly:
``max_len`` guard, ~900 rows at α=.5 before 2^t leaves the exact-int
range of doubles — beyond that, chunk the series or use a smaller α
with the documented 1-ulp cross-engine caveat).

Scale: one keyed window (hash-partitioned by key, sorted within) —
exactly the sessionize/moving-average shuffle shape; series length per
key is the only memory bound.

Reference counterpart: none; time-series smoothing extends the
analytics family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
    max_len: int = 900,
) -> DataFrame:
    """Append ``out_col`` = EWMA of ``value`` over each ``key`` series
    ordered by ``order`` (e_0 = x_0; e_t = (1−α)e_{t−1} + αx_t)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    r = 1.0 - alpha
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.row_number().over(Window.partitionBy(key).orderBy(order)) - 1
    # loud length guard: (1/r)^t must stay finite/exact-range
    guarded_t = F.when(
        t >= max_len,
        F.raise_error(
            F.lit(
                f"ewma: series longer than max_len={max_len} for alpha={alpha} "
                "— chunk the series or lower alpha/max_len"
            )
        ).cast("int"),
    ).otherwise(t)
    inv_r_pow = F.pow(F.lit(1.0 / r), guarded_t)
    p = F.sum(F.col(value) * inv_r_pow).over(w)
    x0 = F.first(value).over(w)
    e = F.lit(alpha) * F.pow(F.lit(r), guarded_t) * p + F.pow(
        F.lit(r), guarded_t
    ) * F.lit(r) * x0
    # at t the closed form counts x_0 via BOTH terms: α·r^t·x_0 + r^{t+1}·x_0
    # = r^t·x_0·(α + r) = r^t·x_0 — matching e_0 = x_0 exactly
    return df.withColumn(out_col, e)
