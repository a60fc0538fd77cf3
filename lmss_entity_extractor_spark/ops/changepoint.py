"""CUSUM changepoint detection (L154): the classic two-sided control
chart — S_t = max(0, S_{t−1} + (x_t − target − slack)) upper,
T_t = max(0, T_{t−1} + (target − x_t − slack)) lower — which looks
inherently sequential but has a prefix-sum closed form (the L93 EWMA
trick, here EXACT): with dᵢ = xᵢ − target − slack and the prefix sum
Pₜ = Σ_{i≤t} dᵢ,

    Sₜ = max_{k∈[0..t]} (Pₜ − Pₖ) = Pₜ − min(0, min_{k≤t} Pₖ)

(P₀ = 0 is the `least(0, ·)`), and symmetrically for Tₜ.  So the
whole recurrence is ONE keyed window sort carrying two running
aggregates per side — and because x/target/slack are DECIMALs, every
Pₜ and Sₜ is EXACT (order-insensitive decimal sums; no float drift,
no grid, not even a division).  Alarm rows are S/T > threshold.

Row order is pinned by explicit order columns which must form a total
order per key.  NULL values are refused (they would silently shift
the cumulative sums).

Scale shape: exactly the sessionize/moving-average shuffle — one hash
exchange on the key, one sort within partitions, window aggregates
streamed.  100 TB of series data = one shuffle; per-key series length
is the only memory bound (same as any ordered window).

No reference counterpart; drift/monitoring analytics per SURVEY §2.11
(composes with PSI L131 / KS L147 / ACF L151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    target: str,
    slack: str,
    threshold: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., order_cols..., value, s_hi, s_lo, alarm_hi,
    alarm_lo)`` — per-row CUSUM statistics and alarm flags.  ``target``
    / ``slack`` / ``threshold`` are decimal strings (e.g. ``"50.00"``)
    so the arithmetic stays exact; values must be exactly
    representable at DECIMAL(18, scale)."""
    n_null = df.filter(F.col(value_col).isNull()).count()
    if n_null:
        raise ValueError(
            f"cusum: {n_null} NULL value(s) in {value_col!r} — drop or "
            "impute first; skipping rows would shift the prefix sums"
        )
    dec = f"decimal(18,{scale})"
    wide = "decimal(30,%d)" % scale
    x = F.col(value_col).cast(dec)
    t_lit = F.lit(target).cast(dec)
    k_lit = F.lit(slack).cast(dec)
    h_lit = F.lit(threshold).cast(wide)
    zero = F.lit(0).cast(wide)
    base = df.select(*by, *order_cols, x.alias("_x"))
    w = (
        Window.partitionBy(*by)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d_hi = (F.col("_x") - t_lit - k_lit).cast(wide)
    d_lo = (t_lit - F.col("_x") - k_lit).cast(wide)
    staged = base.select(
        *by, *order_cols, "_x", d_hi.alias("_dh"), d_lo.alias("_dl")
    )
    # two projection steps (window fns don't nest), but the window
    # specs are identical so the plan keeps ONE exchange + sort
    prefixed = staged.select(
        *by,
        *order_cols,
        "_x",
        F.sum("_dh").over(w).cast(wide).alias("_ph"),
        F.sum("_dl").over(w).cast(wide).alias("_pl"),
    )
    cum = prefixed.select(
        *by,
        *order_cols,
        "_x",
        "_ph",
        "_pl",
        F.min("_ph").over(w).cast(wide).alias("_mh"),
        F.min("_pl").over(w).cast(wide).alias("_ml"),
    )
    s_hi = F.col("_ph") - F.least(zero, F.col("_mh"))
    s_lo = F.col("_pl") - F.least(zero, F.col("_ml"))
    return cum.select(
        *by,
        *order_cols,
        F.col("_x").cast("double").alias("value"),
        s_hi.cast("double").alias("s_hi"),
        s_lo.cast("double").alias("s_lo"),
        (s_hi > h_lit).alias("alarm_hi"),
        (s_lo > h_lit).alias("alarm_lo"),
    )
