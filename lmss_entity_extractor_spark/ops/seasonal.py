"""Classical seasonal decomposition (L163): x = trend + seasonal +
remainder by the textbook moving-average method — the first cut at
"is this metric seasonal or actually growing" before any model.

Assumes a REGULARLY-SPACED series per key (resample with L112 first);
``order_col`` provides the order, ``t % period`` by POSITION (a dense
0-based row index is minted per key so gaps in the raw order values
don't shear the phase lattice).

Determinism: the trend is a centered moving average whose NUMERATOR
stays an exact DECIMAL window sum —

    odd p:  trend = W_p / p          (W = p-wide centered sum)
    even p: trend = (W_a + W_b)/2p   (the classical 2×p MA: the two
                                      p-wide sums straddling center)

— one IEEE division per row.  Seasonal indices per phase k avoid the
order-dependent float mean of detrended values entirely:

    raw_k = Σ_{i∈k} (p·xᵢ − Wᵢ)  [exact decimal]  / (p·m_k)
            (even p: (2p·xᵢ − W_a − W_b) / (2p·m_k))

then classically centered by subtracting the phase-fold mean of the
raw indices (a 0.0-prepended k-sorted fold over ≤p values).  Edge
rows with incomplete windows get NULL trend and are excluded from the
index fit, as in the textbook method.  remainder = (x − trend) −
seasonal, a fixed tree.  Everything is bit-stable across parallelism.

Scale shape: one keyed window sort (positional frames) + one bounded
groupBy per phase + a broadcast of the ≤p seasonal indices — a 100 TB
series table is scanned twice, shuffled once by key.

No reference counterpart; time-series analytics per SURVEY §2.11
(composes with L112 resampling, L151 ACF, L161 trend tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def seasonal_decompose(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    period: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., order_col, value, phase, trend, seasonal, remainder)``
    — additive classical decomposition per key.  NULL values refused
    (they would shear the positional lattice)."""
    if period < 2:
        raise ValueError("seasonal_decompose: period must be >= 2")
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"seasonal_decompose: {n_null} NULL value(s) in {value_col!r}"
                " — gap-fill first (ops.timeseries.resample_gap_fill); a "
                "skipped row shears the positional phase lattice"
            )
    dec = f"decimal(18,{scale})"
    p = period
    base = df.select(
        *by, F.col(order_col).alias("_o"), F.col(value_col).cast(dec).alias("_x")
    )
    w = Window.partitionBy(*by).orderBy("_o")
    base = base.withColumn("_i", F.row_number().over(w) - 1)
    half = p // 2
    if p % 2 == 1:
        frame = w.rowsBetween(-half, half)
        wsum = F.sum("_x").over(frame).alias("_w")
        cnt = F.count("_x").over(frame).alias("_wc")
        staged = base.select(*by, "_o", "_x", "_i", wsum, cnt)
        full = F.col("_wc") == p
        trend = F.when(full, F.col("_w").cast("double") / F.lit(float(p)))
        # p·x − W : exact decimal numerator of the detrended value
        # (decimal(9,0) multiplier keeps the product under the 38-digit
        # cap on BOTH engines — no precision-cap scale divergence)
        det_num = F.lit(p).cast("decimal(9,0)") * F.col("_x") - F.col("_w")
        denom_per_row = float(p)
    else:
        wa = w.rowsBetween(-half, half - 1)
        wb = w.rowsBetween(-half + 1, half)
        staged = base.select(
            *by,
            "_o",
            "_x",
            "_i",
            F.sum("_x").over(wa).alias("_wa"),
            F.count("_x").over(wa).alias("_ca"),
            F.sum("_x").over(wb).alias("_wb"),
            F.count("_x").over(wb).alias("_cb"),
        )
        full = (F.col("_ca") == p) & (F.col("_cb") == p)
        trend = F.when(
            full,
            (F.col("_wa") + F.col("_wb")).cast("double") / F.lit(float(2 * p)),
        )
        det_num = (
            F.lit(2 * p).cast("decimal(9,0)") * F.col("_x")
            - F.col("_wa")
            - F.col("_wb")
        )
        denom_per_row = float(2 * p)
    staged = staged.select(
        *by,
        "_o",
        "_x",
        (F.col("_i") % p).alias("phase"),
        trend.alias("trend"),
        F.when(full, det_num).alias("_dn"),
    )
    # raw seasonal index per phase from exact numerators
    idx = (
        staged.filter(F.col("_dn").isNotNull())
        .groupBy(*by, "phase")
        .agg(F.sum("_dn").alias("_num"), F.count(F.lit(1)).alias("_m"))
        .select(
            *by,
            "phase",
            (
                F.col("_num").cast("double")
                / (F.lit(denom_per_row) * F.col("_m").cast("double"))
            ).alias("_raw"),
        )
    )
    # classical centering: subtract the phase-fold mean of raw indices
    packed = idx.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("phase", "_raw"))).alias("_a")
    )
    mean_raw = F.aggregate(
        "_a", F.lit(0.0), lambda acc, s: acc + s["_raw"]
    ) / F.size("_a").cast("double")
    centered = packed.select(
        *by,
        F.explode(
            F.transform(
                "_a",
                lambda s: F.struct(
                    s["phase"].alias("phase"),
                    (s["_raw"] - mean_raw).alias("seasonal"),
                ),
            )
        ).alias("_s"),
    ).select(*by, F.col("_s.phase").alias("phase"), F.col("_s.seasonal").alias("seasonal"))
    out = staged.join(centered, [*by, "phase"], "left")
    xd = F.col("_x").cast("double")
    return out.select(
        *by,
        F.col("_o").alias(order_col),
        xd.alias("value"),
        "phase",
        "trend",
        "seasonal",
        F.when(
            F.col("trend").isNotNull() & F.col("seasonal").isNotNull(),
            (xd - F.col("trend")) - F.col("seasonal"),
        ).alias("remainder"),
    )


def seasonal_strength(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    period: int,
    scale: int = 2,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n_used, trend_strength, seasonal_strength)`` — the
    Hyndman trend/seasonal strength indices (L285) over the L163
    classical decomposition x = T + S + R:

        F_T = max(0, 1 − SS(R)/SS(T+R))
        F_S = max(0, 1 − SS(R)/SS(S+R))

    ("how much of the detrended/deseasonalized variation does the
    component explain" — the triage number that decides whether the
    rollup layer should aggregate by the candidate period at all).
    Only rows with a defined trend (complete moving window) count.
    The variance RATIOS need only the squared-deviation SUMS (shared
    n cancels), so each component takes exactly two order-pinned
    folds (mean, then deviations) over the bounded sorted series —
    no divisions until the final ratio.  Zero detrended variation →
    NULL strength; series beyond ``max_len`` refused.

    Scale shape: inherits L163's one keyed window pass, plus one
    bounded collect + in-array folds.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    d = seasonal_decompose(df, by, order_col, value_col, period, scale)
    flt = d.filter(F.col("remainder").isNotNull())
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"seasonal_strength: a series exceeds max_len={max_len}"
            )
    packed = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col("remainder").alias("r"),
                    (F.col("trend") + F.col("remainder")).alias("tr"),
                    (F.col("seasonal") + F.col("remainder")).alias(
                        "sr"
                    ),
                )
            )
        ).alias("_lv"),
    )
    nd = F.col("n_used").cast("double")

    def _ss(field):
        mean = (
            F.aggregate(
                F.col("_lv"), F.lit(0.0), lambda a, e: a + e[field]
            )
            / nd
        )
        return F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a, e: a + (e[field] - mean) * (e[field] - mean),
        )

    s1 = packed.select(
        *by,
        "n_used",
        _ss("r").alias("_ssr"),
        _ss("tr").alias("_sstr"),
        _ss("sr").alias("_sssr"),
    )
    ft = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("_ssr") / F.col("_sstr")
    )
    fs = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("_ssr") / F.col("_sssr")
    )
    ok = F.col("n_used") >= 2
    return s1.select(
        *by,
        "n_used",
        F.when(ok & (F.col("_sstr") > 0.0), ft).alias(
            "trend_strength"
        ),
        F.when(ok & (F.col("_sssr") > 0.0), fs).alias(
            "seasonal_strength"
        ),
    )
