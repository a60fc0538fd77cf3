"""Per-key time-series operators: EWMA smoothing, regular-grid
resampling with gap-fill, and linear interpolation — all window/
sequence expressions, no recursion, no UDF, no iterative loop.

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
from .validate import validation_enabled


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


def resample_gap_fill(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "avg",
    fill: str = "linear",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Regular-grid resampling with gap-fill (L112): per ``key``, bucket
    observations onto an epoch-aligned grid of ``step_seconds``, emit
    ONE row per grid slot between the key's first and last observation,
    and fill empty slots.

    Output: ``(key, bucket_ts timestamp, value double, is_observed
    boolean)``.

    * ``agg`` — in-bucket reducer for multiple observations: ``avg``
      (natural) or ``max``/``min`` (order-free and float-exact — the
      value-oracle-able choice, used by the contract query).
    * ``fill`` — ``linear`` (time-weighted interpolation between the
      surrounding observed buckets; ends extend flat), ``ffill``
      (last observation carried forward; leading gaps backfilled from
      the first observation), or ``null`` (gaps stay NULL).

    Shape for 100 TB: one keyed aggregation (map-side combinable) to
    buckets, one per-key ``sequence``/``explode`` to mint the spine
    (bounded LOUDLY by ``max_buckets_per_key`` — a key spanning years
    at 1s steps is a config error, not an OOM), one left join back on
    (key, bucket), and two frame-bounded window passes for the fill.
    Everything whole-stage codegen; the only shuffles are the keyed
    agg/join/window on the same key — co-partitioned, so AQE folds
    them onto one exchange.
    """
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    if agg not in ("avg", "max", "min"):
        raise ValueError(f"agg must be avg|max|min, got {agg!r}")
    if fill not in ("linear", "ffill", "null"):
        raise ValueError(f"fill must be linear|ffill|null, got {fill!r}")
    for c in (key, time_col, value_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    step = F.lit(step_seconds).cast("long")
    bucket = (
        F.floor(F.unix_timestamp(F.col(time_col)) / step) * step_seconds
    ).cast("long")
    reducer = {"avg": F.avg, "max": F.max, "min": F.min}[agg]
    obs = (
        df.filter(F.col(time_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(key), bucket.alias("b"), F.col(value_col).alias("v"))
        .groupBy(key, "b")
        .agg(reducer("v").alias("v"))
    )
    span = obs.groupBy(key).agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    n_slots = (F.col("b1") - F.col("b0")) / step_seconds + 1
    guard = F.when(
        n_slots > max_buckets_per_key,
        F.raise_error(
            F.concat(
                F.lit(
                    f"resample_gap_fill: key spans more than {max_buckets_per_key} "
                    f"slots at step={step_seconds}s — raise step_seconds or "
                    "max_buckets_per_key: "
                ),
                F.col(key).cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("b1"))
    spine = span.select(
        key, F.explode(F.sequence(F.col("b0"), guard, step)).alias("b")
    )
    g = spine.join(obs, [key, "b"], "left")

    if fill == "null":
        filled = F.col("v")
    else:
        back = (
            Window.partitionBy(key)
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fwd = (
            Window.partitionBy(key)
            .orderBy("b")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t_obs = F.when(F.col("v").isNotNull(), F.col("b"))
        pv = F.last("v", ignorenulls=True).over(back)
        pt = F.last(t_obs, ignorenulls=True).over(back)
        nv = F.first("v", ignorenulls=True).over(fwd)
        nt = F.first(t_obs, ignorenulls=True).over(fwd)
        if fill == "ffill":
            filled = F.coalesce(F.col("v"), pv, nv)
        else:
            frac = (F.col("b") - pt) / (nt - pt)
            interp = pv + (nv - pv) * frac
            filled = (
                F.when(F.col("v").isNotNull(), F.col("v"))
                .when(pt.isNull(), nv)
                .when(nt.isNull(), pv)
                .otherwise(interp)
            )

    return g.select(
        F.col(key),
        F.timestamp_seconds(F.col("b")).alias("bucket_ts"),
        filled.cast("double").alias("value"),
        F.col("v").isNotNull().alias("is_observed"),
    )


def time_weighted_avg(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """(by..., n, span_micros, twap) — the time-weighted average
    (L182): each observation holds until the next one, so

        TWAP = Σ vᵢ·Δtᵢ / Σ Δtᵢ      (Δtᵢ = tᵢ₊₁ − tᵢ, last obs excluded)

    — the telemetry/finance mean that row-weighted AVG gets wrong on
    irregular sampling.  Values contract-quantized at DECIMAL(18,
    scale); Δt in exact integer MICROseconds (no truncation — truncated
    seconds can collide and lose weight), every v·Δt term an exact
    decimal, ONE final IEEE division.  Keys with < 2 observations →
    NULL (no interval to weight).  One keyed window sort + one
    combinable agg; ties in ts are refused (holding order undefined).
    """
    flt = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    if validation_enabled():
        n_dup = (
            flt.groupBy(*by, ts_col).count().filter(F.col("count") > 1).count()
        )
        if n_dup:
            raise ValueError(
                f"time_weighted_avg: {n_dup} duplicate timestamp(s) within a "
                "key — the holding order is undefined; dedup or bucket first"
            )
    dec = f"decimal(18,{scale})"
    staged = flt.select(
        *by,
        F.col(value_col).cast(dec).alias("_v"),
        # parquet timestamps load as NTZ; the session timezone is pinned
        # UTC (session.py), so the NTZ->TZ cast is value-preserving
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
    ).withColumn("_nt", F.lead("_t").over(Window.partitionBy(*by).orderBy("_t")))
    dt = (F.col("_nt") - F.col("_t")).cast("decimal(19,0)")
    term = F.when(F.col("_nt").isNotNull(), F.col("_v") * dt)
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_nt").isNotNull(), F.col("_nt") - F.col("_t"))).alias(
            "_span"
        ),
        F.sum(term).alias("_num"),
    )
    return agg.select(
        *by,
        "n",
        F.coalesce(F.col("_span"), F.lit(0)).alias("span_micros"),
        F.when(
            F.col("_span").isNotNull() & (F.col("_span") > 0),
            F.col("_num").cast("double") / F.col("_span").cast("double"),
        ).alias("twap"),
    )


def ohlc_bars(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """(by..., bucket_start, open, high, low, close, n) — OHLC resample
    bars (L183): first/last by time via min_by/max_by on the exact
    (epoch-second, tiebreak-free) ordering — duplicate timestamps
    within a (key, bucket) are refused for open/close determinism.
    One combinable groupBy; 100 TB scanned once, shuffled once."""
    if bucket_seconds < 1:
        raise ValueError("ohlc_bars: bucket_seconds must be >= 1")
    flt = df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = (
        F.floor(t / F.lit(bucket_seconds * 1_000_000))
        * (bucket_seconds * 1_000_000)
    ).cast("long")
    base = flt.select(
        *by,
        bucket.alias("bucket_start"),
        t.alias("_t"),
        F.col(value_col).alias("_v"),
    )
    if validation_enabled():
        n_dup = (
            base.groupBy(*by, "bucket_start", "_t")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"ohlc_bars: {n_dup} duplicate timestamp(s) within a bar — "
                "open/close would be nondeterministic; dedup first"
            )
    return base.groupBy(*by, "bucket_start").agg(
        F.min_by("_v", "_t").alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        F.max_by("_v", "_t").alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def forecast_accuracy(
    df: DataFrame,
    by: list[str],
    order_col: str,
    actual_col: str,
    pred_col: str,
    season: int = 1,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, mae, rmse, wape, mase)`` — the forecasting
    scoreboard per series: mean absolute error, root-mean-square
    error, weighted absolute percentage error, and the mean absolute
    SCALED error (Hyndman & Koehler 2006 — MAE relative to the
    in-sample seasonal-naive forecast, the only one of the four that
    is unit-free AND defined when actuals cross zero):

        mae  = Σ|e| / n                 rmse = sqrt(Σe² / n)
        wape = Σ|e| / Σ|y|
        mase = (Σ|e| / n) / (Σ|y_t − y_{t−season}| / n_naive)

    All sums are exact DECIMAL (values contract-quantized at
    DECIMAL(18,scale), the L182 discipline); each metric is one fixed
    IEEE tree over exact sums — bit-identical, ungridded.  The naive
    denominator walks each series in ``order_col`` order (ONE keyed
    window lag); duplicate order keys are REFUSED (the lag would be
    nondeterministic — same rule as TWAP/OHLC).  Σ|y| = 0 → NULL
    wape; Σ|naive| = 0 (constant/short series) → NULL mase.

    Scale shape: one keyed window sort + one combinable agg; 100 TB
    scans once."""
    if season < 1:
        raise ValueError("forecast_accuracy: season must be >= 1")
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(order_col).isNotNull()
        & F.col(actual_col).isNotNull()
        & F.col(pred_col).isNotNull()
    )
    if validation_enabled():
        n_dup = (
            flt.groupBy(*by, order_col).count().filter(F.col("count") > 1).count()
        )
        if n_dup:
            raise ValueError(
                f"forecast_accuracy: {n_dup} duplicate order key(s) within a "
                "series — the seasonal-naive lag is undefined; dedup first"
            )
    y = F.col(actual_col).cast(dec)
    p = F.col(pred_col).cast(dec)
    w = Window.partitionBy(*by).orderBy(order_col)
    staged = flt.select(
        *by,
        y.alias("_y"),
        (y - p).alias("_e"),
        (y - F.lag(y, season).over(w)).alias("_nv"),
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("_e"))).alias("_sae"),
        F.sum(F.col("_e") * F.col("_e")).alias("_sse"),
        F.sum(F.abs(F.col("_y"))).alias("_say"),
        F.sum(F.abs(F.col("_nv"))).alias("_snv"),
        F.sum(F.col("_nv").isNotNull().cast("long")).alias("_nn"),
    )
    nd = F.col("n").cast("double")
    sae = F.col("_sae").cast("double")
    return agg.select(
        *by,
        "n",
        (sae / nd).alias("mae"),
        F.sqrt(F.col("_sse").cast("double") / nd).alias("rmse"),
        F.when(
            F.col("_say") > 0, sae / F.col("_say").cast("double")
        ).alias("wape"),
        F.when(
            (F.col("_snv") > 0) & (F.col("_nn") > 0),
            (sae / nd)
            / (
                F.col("_snv").cast("double")
                / F.col("_nn").cast("double")
            ),
        ).alias("mase"),
    )


def rolling_slope(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    window_rows: int = 10,
    scale: int = 2,
) -> DataFrame:
    """``(df columns..., n_win, slope)`` — per-row rolling OLS slope
    of ``value_col`` against ``order_col`` over the trailing
    ``window_rows`` rows (the trend-velocity signal: EWMA smooths
    level, this measures local DIRECTION — regression per frame
    without a per-frame refit):

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    where all five frame sums ride ONE keyed window (exact DECIMAL —
    x and y both contract-quantized at DECIMAL(18,scale), the L182
    discipline), so each row's slope is one fixed IEEE tree over
    exact sums: bit-identical, ungridded.  Frames with n < 2 or
    constant x yield NULL slope.  Duplicate order keys are refused
    (frame membership would be nondeterministic — the TWAP/OHLC
    rule).

    Scale shape: one keyed window sort; five combinable frame sums
    share the exchange.  100 TB scans once."""
    if window_rows < 2:
        raise ValueError("rolling_slope: window_rows must be >= 2")
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    if validation_enabled():
        n_dup = (
            flt.groupBy(*by, order_col).count().filter(F.col("count") > 1).count()
        )
        if n_dup:
            raise ValueError(
                f"rolling_slope: {n_dup} duplicate order key(s) within a "
                "series — frame membership is undefined; dedup first"
            )
    xd = F.col(order_col).cast(dec)
    yd = F.col(value_col).cast(dec)
    w = (
        Window.partitionBy(*by)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    staged = flt.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(xd).over(w).alias("_sx"),
        F.sum(yd).over(w).alias("_sy"),
        F.sum(xd * xd).over(w).alias("_sxx"),
        F.sum(xd * yd).over(w).alias("_sxy"),
    )
    nd = F.col("n_win").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    varx = nd * sxx - sx * sx
    slope = F.when(
        (F.col("n_win") >= 2) & (varx != F.lit(0.0)),
        (nd * sxy - sx * sy) / varx,
    )
    return staged.withColumn("slope", slope).drop(
        "_sx", "_sy", "_sxx", "_sxy"
    )


def durbin_watson(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, dw)`` — the Durbin-Watson statistic of a
    (residual) series per key: DW = Σ_t (e_t − e_{t−1})² / Σ_t e_t² —
    the lag-1 autocorrelation diagnostic (≈2 none, →0 positive, →4
    negative), the model-residual companion to the ACF (L151).

    Values contract-quantized at DECIMAL(18,scale); both sums are
    exact decimals (the squared difference of two exact decimals is
    exact), DW is ONE IEEE division — bit-identical, ungridded.
    Callers pass RESIDUALS (or any series) — typically mean-centered
    first.  n < 2 or a zero denominator (all-zero series) yields NULL
    dw.  Duplicate order keys refused (the lag rule).

    Scale shape: one keyed window lag + one combinable agg."""
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    if validation_enabled():
        n_dup = (
            flt.groupBy(*by, order_col).count().filter(F.col("count") > 1).count()
        )
        if n_dup:
            raise ValueError(
                f"durbin_watson: {n_dup} duplicate order key(s) within a "
                "series — the lag is undefined; dedup first"
            )
    vd = F.col(value_col).cast(dec)
    w = Window.partitionBy(*by).orderBy(order_col)
    staged = flt.select(
        *by,
        vd.alias("_v"),
        (vd - F.lag(vd).over(w)).alias("_d"),
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_v") * F.col("_v")).alias("_ss"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sd"),
    )
    ok = (F.col("n") >= 2) & (F.col("_ss") > 0)
    return agg.select(
        *by,
        "n",
        F.when(
            ok,
            F.col("_sd").cast("double") / F.col("_ss").cast("double"),
        ).alias("dw"),
    )


# Φ⁻¹(i/a) breakpoints for equiprobable N(0,1) bins — the published
# SAX lookup (Lin/Keogh 2003, table to full double precision); both
# engines consume these VALUES as literals, so no erf/quantile
# function parity is needed
_SAX_BREAKPOINTS = {
    2: [0.0],
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [
        -0.8416212335729142,
        -0.2533471031357997,
        0.2533471031357997,
        0.8416212335729142,
    ],
    6: [
        -0.9674215661017014,
        -0.4307272992954576,
        0.0,
        0.4307272992954576,
        0.9674215661017014,
    ],
    7: [
        -1.0675705238963395,
        -0.5659488219974491,
        -0.1800123693617134,
        0.1800123693617134,
        0.5659488219974491,
        1.0675705238963395,
    ],
    8: [
        -1.1503493803760079,
        -0.6744897501960817,
        -0.3186393639643751,
        0.0,
        0.3186393639643751,
        0.6744897501960817,
        1.1503493803760079,
    ],
}


def sax_symbolize(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    n_segments: int,
    alphabet: int = 4,
    scale: int = 2,
) -> DataFrame:
    """``(by..., segment, n_points, paa, z, symbol)`` — SAX symbolic
    aggregate approximation (L231; Lin & Keogh 2003): compress each
    series into ``n_segments`` PAA means, z-normalize, and discretize
    into an ``alphabet``-letter word via equiprobable normal
    breakpoints — the standard pre-step for motif/anomaly mining and
    for indexing 100 TB of series by a short symbolic key.

    Segment assignment is the floor rule seg = ⌊i·w/n⌋ over the 0-based
    row index (exact integer arithmetic; the fractional-split PAA
    variant is deliberately not used — documented convention).  Each
    PAA mean is an exact DECIMAL segment sum with ONE division; the
    per-key mean/sd come from exact decimal sufficient statistics
    (L139 trees); z is a fixed tree; the symbol is a bounded chain of
    literal-breakpoint comparisons (breakpoints embedded as identical
    double VALUES in both engines — the L200/L221 discipline).
    Bit-identical, ungridded.  Zero variance or n < 2 → NULL z/symbol
    (PAA still emitted).  NULL order/value rows are refused loudly
    (they would shift every segment).

    Scale shape: one keyed window sort (the L93/L154 shuffle) + two
    combinable aggs; output is w rows per key.

    No reference counterpart; series-compression analytics per SURVEY
    §2.11.
    """
    if n_segments < 1:
        raise ValueError("sax_symbolize: n_segments must be >= 1")
    if alphabet not in _SAX_BREAKPOINTS:
        raise ValueError(
            f"sax_symbolize: alphabet must be one of "
            f"{sorted(_SAX_BREAKPOINTS)} (published breakpoint table)"
        )
    if not order_cols:
        raise ValueError("sax_symbolize: order_cols must be non-empty")
    bps = _SAX_BREAKPOINTS[alphabet]
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by,
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast(dec).alias("_x"),
    )
    null_cond = F.col("_x").isNull()
    for c in order_cols:
        null_cond = null_cond | F.col(c).isNull()
    if validation_enabled():
        n_null = base.filter(null_cond).count()
        if n_null:
            raise ValueError(
                f"sax_symbolize: {n_null} NULL order/value row(s) — drop or "
                "impute first; skipping rows would shift every segment"
            )
    wk = Window.partitionBy(*by).orderBy(*[F.col(c) for c in order_cols])
    wka = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = base.select(
        *by,
        "_x",
        (F.row_number().over(wk).cast("long") - 1).alias("_i"),
        F.count(F.lit(1)).over(wka).alias("_n"),
        F.sum("_x").over(wka).alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).over(wka).alias("_sxx"),
    )
    seg = F.floor((F.col("_i") * F.lit(n_segments)) / F.col("_n"))
    per = idx.groupBy(*by, "_n", "_s", "_sxx", seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_x").alias("_ss"),
    )
    nd = F.col("_n").cast("double")
    sd_ = F.col("_s").cast("double")
    sxxd = F.col("_sxx").cast("double")
    mean = sd_ / nd
    var = (nd * sxxd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    paa = F.col("_ss").cast("double") / F.col("n_points").cast("double")
    z = (paa - mean) / F.sqrt(var)
    sym = F.lit(0)
    for b in bps:
        sym = sym + F.when(z > F.lit(b), 1).otherwise(0)
    ok = (F.col("_n") >= 2) & (var > 0.0)
    return per.select(
        *by,
        "segment",
        "n_points",
        paa.alias("paa"),
        F.when(ok, z).alias("z"),
        F.when(ok, sym).alias("symbol"),
    )



def interevent_stats(
    df: DataFrame,
    by: list[str],
    ts_col: str,
) -> DataFrame:
    """``(by..., n_gaps, mean_us, sd_us, cv, burstiness)`` — the
    inter-event-time panel (L261): is a stream Poisson-like, periodic,
    or bursty — the arrival-process diagnostic that complements the
    value-side ACF (L151) and the rate test (L250):

        CV = σ/μ        (1 = Poisson, <1 periodic, >1 bursty)
        B  = (σ−μ)/(σ+μ)  (Goh-Barabási burstiness, in (−1, 1))

    Gaps are EXACT integer microseconds (the L182 discipline — a
    truncated-seconds gap collides and loses weight; the pinned UTC
    session tz makes the NTZ→epoch cast value-preserving); sufficient
    statistics are exact decimal sums and every output is a fixed IEEE
    tree.  NULL timestamps are refused loudly (a dropped row silently
    merges two gaps).  Keys with < 2 events have no gaps and are
    omitted; zero-variance or zero-mean panels → NULL cv/burstiness.

    Scale shape: one keyed window sort (the L93/L154 shuffle) + one
    combinable agg.

    No reference counterpart; stream-diagnostics analytics per SURVEY
    §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(ts_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"interevent_stats: {n_null} NULL timestamp(s) — drop "
                "explicitly first; a skipped row silently merges two gaps"
            )
    # NTZ -> TZ cast is value-preserving under the pinned UTC session
    # tz (the L182 discipline); unix_micros needs the TZ flavor
    us = F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us")
    w = Window.partitionBy(*by).orderBy("_us")
    gaps = (
        df.select(*by, us)
        .withColumn("_prev", F.lag("_us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            *by,
            (F.col("_us") - F.col("_prev")).cast("decimal(20,0)").alias(
                "_d"
            ),
        )
    )
    agg = gaps.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_d").alias("_s"),
        F.sum(F.col("_d") * F.col("_d")).alias("_q"),
    )
    nd = F.col("n_gaps").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    mean = sd_ / nd
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    sig = F.sqrt(var)
    ok = (F.col("n_gaps") >= 2) & (var >= 0.0) & (mean > 0.0)
    return agg.select(
        *by,
        "n_gaps",
        mean.alias("mean_us"),
        F.when(F.col("n_gaps") >= 2, sig).alias("sd_us"),
        F.when(ok, sig / mean).alias("cv"),
        F.when(
            ok & (sig + mean > 0.0), (sig - mean) / (sig + mean)
        ).alias("burstiness"),
    )


def holt_linear(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n, level, trend, forecast)`` — Holt linear-trend
    (double) exponential smoothing (L272, Holt 1957): the sequential
    level/trend recurrence that EWMA (L33-era ``ewma``) cannot
    express in closed form because the two states feed each other:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized l₁ = x₁, b₁ = x₂ − x₁ and folded over t = 2..n; the
    one-step-ahead ``forecast`` is l_n + b_n.  The recurrence is a
    LEFT FOLD over the sorted packed series (the L180 ``_packed``
    discipline: bounded length, refused loudly beyond ``max_len``) —
    a fixed IEEE tree per step, so the result is bit-identical to
    the same fold run anywhere (the oracle drives the identical tree
    through a recursive CTE).  Duplicate order keys are REFUSED (the
    recurrence needs a total order); n = 1 → level = x₁, NULL
    trend/forecast.

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold — one scan; series length is the caller's
    resampling contract, not a shuffle property.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError("holt_linear: need 0<alpha<=1, 0<=beta<=1")
    from .trend import _packed

    flt = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    )
    if validation_enabled():
        dups = (
            flt.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"holt_linear: {dups} duplicate order key(s) — the "
                "recurrence needs a total order; pre-aggregate first"
            )
    packed = _packed(flt, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    n = F.size(xs)
    x1 = F.element_at(xs, 1)
    x2 = F.element_at(xs, 2)
    al = F.lit(float(alpha))
    be = F.lit(float(beta))
    one = F.lit(1.0)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("b"))
    rest = F.slice(xs, 2, F.greatest(n - 1, F.lit(0)))

    def step(acc, x):
        lnew = al * x + (one - al) * (acc["l"] + acc["b"])
        bnew = be * (lnew - acc["l"]) + (one - be) * acc["b"]
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    acc = F.aggregate(rest, init, step)
    out = packed.select(
        *by,
        n.alias("n"),
        F.when(n >= 2, acc["l"]).when(n == 1, x1).alias("level"),
        F.when(n >= 2, acc["b"]).alias("trend"),
        F.when(n >= 2, acc["l"] + acc["b"]).alias("forecast"),
    )
    return out


def ar_yule_walker(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    p: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, lag, pacf, ar_coef)`` for lag = 1..p — Yule-Walker
    AR(p) fit + partial autocorrelation function (L273): which lags
    carry DIRECT serial structure once shorter lags are accounted for
    — the model-order diagnostic that the raw ACF (L151) cannot give
    (an AR(1) has geometric ACF at ALL lags but PACF zero beyond 1).

    Solved by the Durbin-Levinson recursion over the L151 exact ACF
    values r₁..r_p:

        κ_m = (r_m − Σ_{j<m} φ_{m−1,j}·r_{m−j}) / E_{m−1}
        φ_{m,j} = φ_{m−1,j} − κ_m·φ_{m−1,m−j},   φ_{m,m} = κ_m
        E_m = E_{m−1}·(1 − κ_m²)

    ``pacf`` at lag m is κ_m; ``ar_coef`` is the final-model φ_{p,·}.
    The recursion is a LEFT FOLD over m = 2..p with a
    (φ-array, κ-array, E) struct accumulator — p is a model order
    (single digits), so the fold is a fixed bounded tree; the oracle
    drives the identical tree through a recursive CTE carrying LIST
    state.  Degenerate inputs (short series, zero variance, E = 0)
    propagate NULL through the fold rather than dividing by zero.

    Scale shape: inherits L151's — one stats agg + one keyed window
    pass + one combinable agg per lag; the recursion itself touches
    only the p-row-per-group ACF table.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if p < 1:
        raise ValueError("ar_yule_walker: p >= 1 required")
    from .concentration import acf as _acf

    a = _acf(df, by, order_cols, value_col, max_lag=p, scale=scale)
    packed = a.groupBy(*by).agg(
        F.min("n").alias("n"),
        F.sort_array(F.collect_list(F.struct("lag", "r"))).alias("_lv"),
    )
    rs = F.transform(F.col("_lv"), lambda s: s["r"])
    r1 = F.element_at(rs, 1)
    init = F.struct(
        F.array(r1).alias("phis"),
        F.array(r1).alias("pacfs"),
        (F.lit(1.0) - r1 * r1).alias("e"),
    )
    if p >= 2:

        def step(acc, m):
            num = F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), m - 1),
                    lambda j: F.element_at(acc["phis"], j)
                    * F.element_at(rs, m - j),
                ),
                F.lit(0.0),
                lambda s, t: s + t,
            )
            k = F.when(
                acc["e"] != 0.0,
                (F.element_at(rs, m) - num) / acc["e"],
            )
            new_phis = F.concat(
                F.transform(
                    F.sequence(F.lit(1), m - 1),
                    lambda j: F.element_at(acc["phis"], j)
                    - k * F.element_at(acc["phis"], m - j),
                ),
                F.array(k),
            )
            return F.struct(
                new_phis.alias("phis"),
                F.concat(acc["pacfs"], F.array(k)).alias("pacfs"),
                (acc["e"] * (F.lit(1.0) - k * k)).alias("e"),
            )

        acc = F.aggregate(F.sequence(F.lit(2), F.lit(p)), init, step)
    else:
        acc = init
    staged = packed.select(*by, "n", acc.alias("_acc"))
    exploded = staged.select(
        *by,
        "n",
        "_acc",
        F.explode(F.sequence(F.lit(1), F.lit(p))).alias("lag"),
    )
    return exploded.select(
        *by,
        "n",
        "lag",
        F.element_at(F.col("_acc")["pacfs"], F.col("lag")).alias("pacf"),
        F.element_at(F.col("_acc")["phis"], F.col("lag")).alias(
            "ar_coef"
        ),
    )


def periodogram(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    periods: list[int],
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., period, n, power)`` — variance-normalized
    periodogram power at CANDIDATE periods (L274): how much of a
    series' variance is explained by a sinusoid of each period — the
    seasonality detector that tells the resampling/rollup layers
    which cycle length (daily/weekly/monthly) to aggregate on:

        C_P = Σ_t (x_t − x̄)·cos(2πt/P),  S_P likewise with sin
        power_P = 2·(C_P² + S_P²) / (n·Σ(x − x̄)²)   (= 1 for a pure
                                                      tone of period P)

    t is the 0-based position in the sorted series.  Every sum is a
    LEFT FOLD over the bounded packed series (the L180 discipline) —
    order-pinned, a fixed IEEE tree per term; cos/sin are the libm
    reliance shared with the L257 family.  NULL values and duplicate
    order keys are REFUSED (they would shift the position lattice);
    zero variance → NULL power.

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold per candidate period — one scan; the period list is
    a literal.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not periods or any(int(q) < 2 for q in periods):
        raise ValueError("periodogram: periods must all be >= 2")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"periodogram: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"periodogram: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    nd = n.cast("double")
    xbar = (
        F.aggregate(F.col("_xs"), F.lit(0.0), lambda a, x: a + x) / nd
    )
    wide = staged.select(
        *by,
        "_xs",
        n.alias("n"),
        xbar.alias("_xbar"),
        F.explode(
            F.array(*[F.lit(int(q)) for q in periods])
        ).alias("period"),
    )
    tau = F.lit(6.283185307179586)
    pd_ = F.col("period").cast("double")
    idx = F.sequence(F.lit(0), F.col("n") - 1)

    def _fold(term):
        return F.aggregate(idx, F.lit(0.0), lambda a, i: a + term(i))

    x_at = lambda i: F.element_at(F.col("_xs"), i + 1) - F.col("_xbar")
    c = _fold(lambda i: x_at(i) * F.cos(tau * i.cast("double") / pd_))
    s = _fold(lambda i: x_at(i) * F.sin(tau * i.cast("double") / pd_))
    den = _fold(lambda i: x_at(i) * x_at(i))
    power = F.lit(2.0) * (c * c + s * s) / (F.col("n").cast("double") * den)
    return wide.select(
        *by,
        "period",
        "n",
        F.when((F.col("n") >= 2) & (den > 0.0), power).alias("power"),
    )


def croston(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.1,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n, n_demands, z_hat, p_hat, forecast, forecast_sba)``
    — Croston's method for INTERMITTENT demand (L280, Croston 1972):
    when most periods are zero (spare parts, long-tail SKUs, rare
    event classes), plain SES (L93) and Holt (L272) forecast garbage;
    Croston runs TWO exponential smoothers — one over the nonzero
    demand SIZES z, one over the INTER-DEMAND intervals q — and
    forecasts z/p per period, with the Syntetos-Boylan approximation
    (1 − α/2)·z/p correcting Croston's positive bias:

        at each nonzero xₜ:  ẑ ← α·xₜ + (1−α)·ẑ
                             p̂ ← α·qₜ + (1−α)·p̂
        initialized ẑ = first nonzero value, p̂ = its 1-based
        position (periods waited for the first demand).

    One LEFT FOLD over the nonzero (position, value) sublist of the
    bounded packed series with a (z, p, prev_pos) accumulator — the
    oracle drives the identical tree via a 3-double LIST accumulator.
    Negative demands REFUSED; an all-zero series → NULL forecasts;
    duplicate order keys refused (holt's contract).

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("croston: need 0 < alpha <= 1")
    from .trend import _packed

    flt = df.filter(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    )
    if validation_enabled():
        n_neg = flt.filter(F.col(value_col) < 0).count()
        if n_neg:
            raise ValueError(f"croston: {n_neg} negative demand(s)")
    if validation_enabled():
        dups = (
            flt.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(f"croston: {dups} duplicate order key(s)")
    packed = _packed(flt, by, order_col, value_col, max_len)
    indexed = F.transform(
        F.col("_a"),
        lambda s, i: F.struct(
            (i + 1).cast("double").alias("pos"), s["_x"].alias("x")
        ),
    )
    nz = F.filter(indexed, lambda e: e["x"] != 0.0)
    al = F.lit(float(alpha))
    one = F.lit(1.0)
    first = F.element_at(nz, 1)
    init = F.struct(
        first["x"].alias("z"),
        first["pos"].alias("p"),
        first["pos"].alias("prev"),
    )
    rest = F.slice(
        nz, 2, F.greatest(F.size(nz) - 1, F.lit(0))
    )

    def step(acc, e):
        return F.struct(
            (al * e["x"] + (one - al) * acc["z"]).alias("z"),
            (al * (e["pos"] - acc["prev"]) + (one - al) * acc["p"]).alias(
                "p"
            ),
            e["pos"].alias("prev"),
        )

    acc = F.aggregate(rest, init, step)
    k = F.size(nz)
    fc = acc["z"] / acc["p"]
    out = packed.select(
        *by,
        F.size("_a").alias("n"),
        k.alias("n_demands"),
        F.when(k >= 1, acc["z"]).alias("z_hat"),
        F.when(k >= 1, acc["p"]).alias("p_hat"),
        F.when(k >= 1, fc).alias("forecast"),
        F.when(k >= 1, (one - al / F.lit(2.0)) * fc).alias(
            "forecast_sba"
        ),
    )
    return out


def theta_forecast(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n, intercept, slope, ses_theta2, forecast)`` — the
    Theta method (L281, Assimakopoulos & Nikolopoulos 2000; the M3
    competition winner): decompose the series into the θ=0 line (the
    pure linear trend) and the θ=2 line (curvature doubled), forecast
    each, and average:

        θ2ᵢ = 2·xᵢ − (a + b·i)          (OLS a,b over positions)
        SES fold over θ2 (smoothing α);  θ0 forecast = a + b·(n+1)
        forecast = (SES + θ0) / 2

    Positions are exact integers, so the OLS normal equations use
    exact Σi/Σi² with order-pinned folds for Σx/Σi·x; the θ2 line and
    the SES recurrence are further LEFT FOLDS over the bounded packed
    series (the L272 discipline) — one fixed IEEE tree end-to-end.
    n < 2 → NULL forecast; duplicate order keys and NULLs refused.

    Scale shape: one (keys) groupBy packing the bounded series + two
    in-array folds.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("theta_forecast: need 0 < alpha <= 1")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"theta_forecast: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"theta_forecast: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    nd = n.cast("double")
    idx = F.sequence(F.lit(1), n)
    sx = F.aggregate(F.col("_xs"), F.lit(0.0), lambda a, x: a + x)
    six = F.aggregate(
        idx,
        F.lit(0.0),
        lambda a, i: a
        + i.cast("double") * F.element_at(F.col("_xs"), i),
    )
    si = nd * (nd + F.lit(1.0)) / F.lit(2.0)
    sii = (
        nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0))
        / F.lit(6.0)
    )
    varn = nd * sii - si * si
    b = F.when(varn > 0.0, (nd * six - si * sx) / varn)
    s1 = staged.select(
        *by,
        n.alias("n"),
        F.col("_xs"),
        b.alias("_b"),
    )
    a_ = (sx - F.col("_b") * si) / nd
    s2 = s1.select(*by, "n", "_xs", "_b", a_.alias("_a0"))
    nloc = F.col("n")
    ys = F.transform(
        F.sequence(F.lit(1), nloc),
        lambda i: F.lit(2.0) * F.element_at(F.col("_xs"), i)
        - (F.col("_a0") + F.col("_b") * i.cast("double")),
    )
    s3 = s2.select(*by, "n", "_b", "_a0", ys.alias("_ys"))
    al = F.lit(float(alpha))
    one = F.lit(1.0)
    ses = F.aggregate(
        F.slice(
            F.col("_ys"), 2, F.greatest(F.size("_ys") - 1, F.lit(0))
        ),
        F.element_at(F.col("_ys"), 1),
        lambda acc, y: al * y + (one - al) * acc,
    )
    theta0 = F.col("_a0") + F.col("_b") * (
        F.col("n").cast("double") + F.lit(1.0)
    )
    ok = F.col("n") >= 2
    return s3.select(
        *by,
        "n",
        F.when(ok, F.col("_a0")).alias("intercept"),
        F.when(ok, F.col("_b")).alias("slope"),
        F.when(ok, ses).alias("ses_theta2"),
        F.when(ok, (ses + theta0) / F.lit(2.0)).alias("forecast"),
    )


def spectral_entropy(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    max_len: int = 2048,
) -> DataFrame:
    """``(by..., n, k_freqs, entropy, entropy_norm)`` — spectral
    (Shannon) entropy of the periodogram over the full Fourier grid
    (L282): HOW FORECASTABLE is a series — a pure tone concentrates
    all power in one frequency (entropy → 0), white noise spreads it
    flat (entropy_norm → 1); the single-number complement to the
    candidate-period probe (L274):

        P_k = C_k² + S_k²  (k = 1..⌊n/2⌋, mean-centred cos/sin sums)
        H = −Σ (P_k/ΣP)·ln(P_k/ΣP),   entropy_norm = H / ln(K)

    Every sum is an order-pinned LEFT FOLD; the power array is
    materialized once and total/entropy are staged selects so the
    O(n²) inner work runs once.  ``max_len`` defaults LOW (2048)
    because the Fourier grid is quadratic in the series length —
    resample first, that is the contract.  Constant series (ΣP = 0)
    → NULL; K < 2 → NULL entropy_norm.

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold per Fourier frequency.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"spectral_entropy: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"spectral_entropy: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    nd = n.cast("double")
    xbar = (
        F.aggregate(F.col("_xs"), F.lit(0.0), lambda a, x: a + x) / nd
    )
    s1 = staged.select(
        *by, "_xs", n.alias("n"), xbar.alias("_xbar")
    )
    tau = F.lit(6.283185307179586)
    nl = F.col("n")
    nld = nl.cast("double")

    def _trig(k, fn):
        return F.aggregate(
            F.sequence(F.lit(0), nl - 1),
            F.lit(0.0),
            lambda a, i: a
            + (
                F.element_at(F.col("_xs"), i + 1) - F.col("_xbar")
            )
            * fn(
                tau
                * k.cast("double")
                * i.cast("double")
                / nld
            ),
        )

    ps = F.transform(
        F.sequence(F.lit(1), F.floor(nl / 2).cast("int")),
        lambda k: _trig(k, F.cos) * _trig(k, F.cos)
        + _trig(k, F.sin) * _trig(k, F.sin),
    )
    s2 = s1.select(*by, "n", ps.alias("_ps"))
    total = F.aggregate(F.col("_ps"), F.lit(0.0), lambda a, p: a + p)
    s3 = s2.select(*by, "n", "_ps", total.alias("_tot"))
    h = -F.aggregate(
        F.col("_ps"),
        F.lit(0.0),
        lambda a, p: a
        + F.when(
            p > 0.0,
            (p / F.col("_tot")) * F.log(p / F.col("_tot")),
        ).otherwise(F.lit(0.0)),
    )
    k_ = F.size("_ps")
    ok = (F.col("n") >= 3) & (F.col("_tot") > 0.0)
    return s3.select(
        *by,
        "n",
        k_.alias("k_freqs"),
        F.when(ok, h).alias("entropy"),
        F.when(
            ok & (k_ >= 2), h / F.log(k_.cast("double"))
        ).alias("entropy_norm"),
    )


def dickey_fuller(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_pairs, rho, t_df)`` — the (non-augmented)
    Dickey-Fuller unit-root test (L287): is a series mean-reverting
    (stationary) or a random walk — the decision that gates every
    downstream model choice (difference first, or model levels):

        Δxₜ = α + ρ·xₜ₋₁ + εₜ,   t_DF = ρ̂ / se(ρ̂)

    (compare t_DF against Dickey-Fuller critical values, e.g. −2.86
    at 5% with constant — far below the normal −1.64, which is the
    whole point of the test).  The lag pairs come from ONE keyed
    window; (xₜ₋₁, Δx) are exact decimals, so the five OLS sufficient
    sums are order-insensitive and combinable, and ρ̂/SSE/se/t is one
    fixed IEEE tree (the L135 discipline).  NULLs refused; n_pairs
    < 3 or zero x-variance → NULL.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"dickey_fuller: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    xd = F.col(value_col).cast(dec)
    lagged = df.select(
        *by,
        xd.alias("_x"),
        F.lag(xd, 1).over(wt).alias("_xp"),
    ).filter(F.col("_xp").isNotNull())
    dx = F.col("_x") - F.col("_xp")
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_xp").alias("_sx"),
        F.sum(dx).alias("_sy"),
        F.sum(F.col("_xp") * F.col("_xp")).alias("_sxx"),
        F.sum(F.col("_xp") * dx).alias("_sxy"),
        F.sum(dx * dx).alias("_syy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    varn = nd * sxx - sx * sx
    rho = F.when(varn > 0.0, (nd * sxy - sx * sy) / varn)
    s1 = agg.select(
        *by, "n_pairs", nd.alias("_nd"), sx.alias("_sxd"),
        sy.alias("_syd"), sxx.alias("_sxxd"), sxy.alias("_sxyd"),
        syy.alias("_syyd"), varn.alias("_varn"), rho.alias("_rho"),
    )
    alpha = (F.col("_syd") - F.col("_rho") * F.col("_sxd")) / F.col(
        "_nd"
    )
    sse = (
        F.col("_syyd")
        + F.col("_nd") * alpha * alpha
        + F.col("_rho") * F.col("_rho") * F.col("_sxxd")
        - F.lit(2.0) * alpha * F.col("_syd")
        - F.lit(2.0) * F.col("_rho") * F.col("_sxyd")
        + F.lit(2.0) * alpha * F.col("_rho") * F.col("_sxd")
    )
    se = F.sqrt(
        sse
        / (F.col("_nd") - F.lit(2.0))
        / (F.col("_sxxd") - F.col("_sxd") * F.col("_sxd") / F.col("_nd"))
    )
    ok = (
        (F.col("n_pairs") >= 3)
        & (F.col("_varn") > 0.0)
        & (sse > 0.0)
    )
    return s1.select(
        *by,
        "n_pairs",
        F.when(F.col("_varn") > 0.0, F.col("_rho")).alias("rho"),
        F.when(ok, F.col("_rho") / se).alias("t_df"),
    )


def granger_1lag(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    y_col: str,
    x_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_used, beta_x, f_stat, df1, df2)`` — Granger
    causality at one lag (L289): does knowing yesterday's x improve
    today's y forecast beyond yesterday's y — the standard
    lead/lag-screening test between metric pairs (does signup volume
    LEAD revenue, does error rate LEAD churn):

        unrestricted:  yₜ = β₀ + β₁·yₜ₋₁ + β₂·xₜ₋₁
        restricted:    yₜ = α₀ + α₁·yₜ₋₁
        F = (SSE_r − SSE_u) / (SSE_u / (n − 3)),  df = (1, n−3)

    Both regressions come from the SAME nine exact decimal sufficient
    sums (one keyed window for the lags + one combinable agg); the
    3×3 normal equations solve by Cramer determinants — a fixed IEEE
    tree, no iteration, no matrix library.  SSE via the identity
    SSE = Syy − βᵀXᵀy.  Singular design (D ≤ 0 after the exact-sum
    cancellations) or n < 4 → NULL.  NULLs in either series refused.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(y_col).isNull() | F.col(x_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"granger_1lag: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    yd = F.col(y_col).cast(dec)
    xd = F.col(x_col).cast(dec)
    lagged = df.select(
        *by,
        yd.alias("_y"),
        F.lag(yd, 1).over(wt).alias("_a"),
        F.lag(xd, 1).over(wt).alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("_y").alias("_sy"),
        F.sum("_a").alias("_sa"),
        F.sum("_b").alias("_sb"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_a") * F.col("_a")).alias("_saa"),
        F.sum(F.col("_b") * F.col("_b")).alias("_sbb"),
        F.sum(F.col("_y") * F.col("_a")).alias("_sya"),
        F.sum(F.col("_y") * F.col("_b")).alias("_syb"),
        F.sum(F.col("_a") * F.col("_b")).alias("_sab"),
    )
    cols = {
        "nd": F.col("n_used").cast("double"),
        **{
            k: F.col(f"_{k}").cast("double")
            for k in (
                "sy", "sa", "sb", "syy", "saa", "sbb", "sya",
                "syb", "sab",
            )
        },
    }
    s1 = agg.select(*by, "n_used", *[v.alias(k) for k, v in cols.items()])
    e = F.expr
    det = e(
        "nd*(saa*sbb - sab*sab) - sa*(sa*sbb - sab*sb)"
        " + sb*(sa*sab - saa*sb)"
    )
    s2 = s1.withColumn("det", det)
    b0 = e(
        "CASE WHEN det <> 0.0 THEN"
        " (sy*(saa*sbb - sab*sab) - sa*(sya*sbb - sab*syb)"
        "  + sb*(sya*sab - saa*syb)) / det END"
    )
    b1 = e(
        "CASE WHEN det <> 0.0 THEN"
        " (nd*(sya*sbb - sab*syb) - sy*(sa*sbb - sab*sb)"
        "  + sb*(sa*syb - sya*sb)) / det END"
    )
    b2 = e(
        "CASE WHEN det <> 0.0 THEN"
        " (nd*(saa*syb - sya*sab) - sa*(sa*syb - sya*sb)"
        "  + sy*(sa*sab - saa*sb)) / det END"
    )
    s3 = s2.withColumns({"b0": b0, "b1": b1, "b2": b2})
    sse_u = e("syy - b0*sy - b1*sya - b2*syb")
    varn = e("nd*saa - sa*sa")
    a1 = e("CASE WHEN nd*saa - sa*sa > 0.0 THEN"
           " (nd*sya - sa*sy) / (nd*saa - sa*sa) END")
    s4 = s3.withColumns({"sse_u": sse_u, "a1": a1, "varn": varn})
    a0 = e("(sy - a1*sa) / nd")
    s5 = s4.withColumn("a0", a0)
    sse_r = e("syy - a0*sy - a1*sya")
    s6 = s5.withColumn("sse_r", sse_r)
    fstat = e("(sse_r - sse_u) / (sse_u / (nd - 3.0))")
    ok = (
        (F.col("n_used") >= 4)
        & (F.col("det") != 0.0)
        & (F.col("varn") > 0.0)
        & (F.col("sse_u") > 0.0)
    )
    return s6.select(
        *by,
        "n_used",
        F.when(F.col("det") != 0.0, F.col("b2")).alias("beta_x"),
        F.when(ok, fstat).alias("f_stat"),
        F.when(ok, F.lit(1)).alias("df1"),
        F.when(ok, F.col("n_used") - 3).alias("df2"),
    )


def arch_lm(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_pairs, r2, lm)`` — Engle's ARCH(1) LM test (L290):
    does today's VOLATILITY depend on yesterday's — the clustering-
    of-variance screen (calm days follow calm days) that decides
    whether a constant-variance model (and every test assuming it)
    is even admissible:

        LM = n·R²  of  u²ₜ on u²ₜ₋₁,   u = x − x̄,   df = 1

    EXACT trick: R² is invariant to any common scaling of u², so the
    regression runs on w = c² with c = n·q − Σq over the INTEGER
    micro-units q = x·10^scale (the L151 cross-multiplied centring ×
    the L266 quantization) — every sum is an exact DECIMAL(38,0)
    integer, the lag is one keyed window, and R² is one fixed tree.
    DECIMAL(38,0) bounds w² ≈ (n·q)⁴: safe while n·|q| ≲ 10⁹ (ANSI
    fails loudly beyond — rescale first).  n_pairs < 3 or a
    degenerate side → NULL.  NULLs refused.

    Scale shape: one stats agg + broadcast join + one keyed window
    pass + one combinable agg (the L151 shape).

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"arch_lm: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    d0 = "decimal(38,0)"
    xq = (F.col(value_col).cast(dec) * F.lit(10**scale)).cast(d0)
    base = df.select(
        *by,
        *[c for c in order_cols],
        xq.alias("_x"),
    )
    stats = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    joined = base.join(F.broadcast(stats), by)
    c = F.col("_n").cast(d0) * F.col("_x") - F.col("_s")
    w = (c * c).alias("_w")
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(o) for o in order_cols]
    )
    staged = joined.select(*by, *order_cols, w)
    lagged = staged.select(
        *by,
        F.col("_w"),
        F.lag("_w", 1).over(wt).alias("_wp"),
    ).filter(F.col("_wp").isNotNull())
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_wp").alias("_sx"),
        F.sum("_w").alias("_sy"),
        F.sum(F.col("_wp") * F.col("_wp")).alias("_sxx"),
        F.sum(F.col("_wp") * F.col("_w")).alias("_sxy"),
        F.sum(F.col("_w") * F.col("_w")).alias("_syy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    num = nd * sxy - sx * sy
    dx = nd * sxx - sx * sx
    dy = nd * syy - sy * sy
    r2 = (num * num) / (dx * dy)
    ok = (F.col("n_pairs") >= 3) & (dx > 0.0) & (dy > 0.0)
    return agg.select(
        *by,
        "n_pairs",
        F.when(ok, r2).alias("r2"),
        F.when(ok, nd * r2).alias("lm"),
    )


def max_drawdown(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, peak, trough, mdd, mdd_rel)`` — maximum drawdown
    (L314): the deepest peak-to-trough fall of a cumulative curve —
    the risk number behind "how bad did it get before it recovered",
    for revenue run-rates, cache hit curves, battery/SLO budgets:

        dd_t = max_{s≤t} x_s − x_t,   MDD = max_t dd_t
        mdd_rel = MDD / peak-at-that-time   (NULL if peak ≤ 0)

    The running peak is one prefix-max window over exact decimals, so
    every drawdown is an exact decimal and the argmax row is a
    deterministic (dd desc, t asc) window pick — ties take the
    EARLIEST trough.  NULLs refused.

    Scale shape: one keyed window pass + one argmax pick.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"max_drawdown: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wp = wt.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = df.select(
        *by,
        xd.alias("_x"),
        F.max(xd).over(wp).alias("_peak"),
        F.row_number().over(wt).alias("_t"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    dd = F.col("_peak") - F.col("_x")
    scored = staged.select(
        *by, "_x", "_peak", "_t", "_n", dd.alias("_dd")
    )
    wr = Window.partitionBy(*by).orderBy(
        F.desc("_dd"), F.asc("_t")
    )
    top = scored.select(
        *by, "_x", "_peak", "_n", "_dd",
        F.row_number().over(wr).alias("_rn"),
    ).filter(F.col("_rn") == 1)
    peak_d = F.col("_peak").cast("double")
    return top.select(
        *by,
        F.col("_n").alias("n"),
        peak_d.alias("peak"),
        F.col("_x").cast("double").alias("trough"),
        F.col("_dd").cast("double").alias("mdd"),
        F.when(
            F.col("_peak") > 0,
            F.col("_dd").cast("double") / peak_d,
        ).alias("mdd_rel"),
    )


def mtbf_mttr(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    state_col: str,
    up_value,
) -> DataFrame:
    """``(by..., n_events, n_failures, mtbf_s, mttr_s,
    availability)`` — reliability summary from a state-change log
    (L330): mean time between failures, mean time to repair, and
    availability — the three SRE numbers a status-event stream
    actually answers:

        failure  = an up→down transition;  repair = down→up
        MTBF = mean gap between consecutive failure STARTS
        MTTR = mean closed down-segment duration
        availability = up time / observed time  (closed segments)

    Timestamps quantize to EXACT integer microseconds (the L182
    discipline), segment durations are exact integer differences, and
    each mean is ONE division.  The trailing segment closes at the
    LAST OBSERVED event (observation ends there; nothing beyond is
    imputed).  NULL states/timestamps refused; groups with < 2
    failures → NULL mtbf; with no closed down segment → NULL mttr.

    Scale shape: two keyed window passes (change-point filter, then
    lead pairing) + one combinable agg.

    No reference counterpart; reliability analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(ts_col).isNull() | F.col(state_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"mtbf_mttr: {n_null} NULL row(s)")
    if validation_enabled():
        dups = (
            df.groupBy(*by, ts_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"mtbf_mttr: {dups} duplicate timestamp(s) — the state "
                "sequence is ambiguous under ties; dedup first"
            )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    up = (F.col(state_col) == F.lit(up_value)).cast("int")
    wt = Window.partitionBy(*by).orderBy("_t")
    wall = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tagged = df.select(*by, us.alias("_t"), up.alias("_u"))
    marked = tagged.select(
        *by,
        "_t",
        "_u",
        F.lag("_u", 1).over(wt).alias("_pu"),
        F.max("_t").over(wall).alias("_mx"),
    ).filter(
        F.col("_pu").isNull() | (F.col("_u") != F.col("_pu"))
    )
    wc = Window.partitionBy(*by).orderBy("_t")
    seg = marked.select(
        *by,
        "_t",
        "_u",
        F.coalesce(
            F.lead("_t", 1).over(wc), F.col("_mx")
        ).alias("_tend"),
        F.when(
            (F.col("_u") == 0) & (F.col("_pu").isNotNull()),
            F.col("_t"),
        ).alias("_fail_t"),
    )
    # consecutive failure starts: window over the failure subset
    fails = seg.filter(F.col("_fail_t").isNotNull()).select(
        *by,
        "_fail_t",
        (
            F.col("_fail_t")
            - F.lag("_fail_t", 1).over(
                Window.partitionBy(*by).orderBy("_fail_t")
            )
        ).alias("_tbf"),
    )
    fagg = fails.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_failures"),
        F.sum("_tbf").alias("_tbf_sum"),
        F.count("_tbf").alias("_tbf_n"),
    )
    closed = seg.filter(F.col("_tend") > F.col("_t")).select(
        *by,
        "_u",
        (F.col("_tend") - F.col("_t")).alias("_dur"),
    )
    cagg = closed.groupBy(*by).agg(
        F.sum(F.when(F.col("_u") == 0, F.col("_dur"))).alias(
            "_down"
        ),
        F.count(
            F.when(F.col("_u") == 0, F.lit(1))
        ).alias("_ndown"),
        F.sum("_dur").alias("_total"),
    )
    nev = df.groupBy(*by).agg(F.count(F.lit(1)).alias("n_events"))
    j = nev.join(fagg, by, "left").join(cagg, by, "left")
    mtbf = F.col("_tbf_sum").cast("double") / F.col("_tbf_n").cast(
        "double"
    ) / F.lit(1e6)
    mttr = F.col("_down").cast("double") / F.col("_ndown").cast(
        "double"
    ) / F.lit(1e6)
    avail = (
        F.col("_total") - F.coalesce(F.col("_down"), F.lit(0))
    ).cast("double") / F.col("_total").cast("double")
    return j.select(
        *by,
        "n_events",
        F.coalesce(F.col("n_failures"), F.lit(0)).alias("n_failures"),
        F.when(F.col("_tbf_n") >= 1, mtbf).alias("mtbf_s"),
        F.when(F.col("_ndown") >= 1, mttr).alias("mttr_s"),
        F.when(
            F.col("_total").isNotNull() & (F.col("_total") > 0),
            avail,
        ).alias("availability"),
    )


def holt_winters_additive(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n, level, trend, forecast)`` — additive Holt-Winters
    triple exponential smoothing (L333): Holt (L272) plus a seasonal
    state, the workhorse for trending-AND-cyclic operational series:

        lₜ = α·(xₜ − s_{t−p}) + (1−α)·(lₜ₋₁ + bₜ₋₁)
        bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
        sₜ = γ·(xₜ − lₜ) + (1−γ)·s_{t−p}
        forecast(+1) = l + b + s_{+1 phase}

    initialized classically from the first two seasons (l₀ = season-1
    mean, b₀ = mean season-over-season step, s₀ᵢ = xᵢ − l₀) and
    folded over t = p+1..n with a (level, trend, seasonal-ARRAY)
    struct accumulator — the seasonal slot for the current phase is
    rewritten via an indexed transform each step, everything else is
    the L272 fold discipline.  Series shorter than 2·period → NULL
    (the classical init needs two full seasons); duplicate order keys
    and NULLs refused.

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if period < 2:
        raise ValueError("holt_winters_additive: period must be >= 2")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < v <= 1.0):
            raise ValueError(
                f"holt_winters_additive: need 0 < {nm} <= 1"
            )
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"holt_winters_additive: {n_null} NULL value(s)"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"holt_winters_additive: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    p = F.lit(int(period))
    pd_ = F.lit(float(period))
    al, be, ga = (
        F.lit(float(alpha)),
        F.lit(float(beta)),
        F.lit(float(gamma)),
    )
    one = F.lit(1.0)
    def at_safe(i):
        # ANSI element_at throws out-of-bounds; short groups (below
        # the 2-season init) must flow to NULL instead, so gate every
        # access on the actual size (lazy CASE)
        return F.when(
            (i >= 1) & (i <= n), F.element_at(F.col("_xs"), i)
        ).otherwise(F.lit(0.0))

    m1 = (
        F.aggregate(
            F.sequence(F.lit(1), p),
            F.lit(0.0),
            lambda a, i: a + at_safe(i),
        )
        / pd_
    )
    m2 = (
        F.aggregate(
            F.sequence(p + 1, F.lit(2) * p),
            F.lit(0.0),
            lambda a, i: a + at_safe(i),
        )
        / pd_
    )
    s1 = staged.select(
        *by,
        "_xs",
        n.alias("n"),
        m1.alias("_m1"),
        ((m2 - m1) / pd_).alias("_b0"),
    )
    nloc = F.size("_xs")

    def xs_safe(i):
        return F.when(
            (i >= 1) & (i <= nloc), F.element_at(F.col("_xs"), i)
        ).otherwise(F.lit(0.0))

    init = F.struct(
        F.col("_m1").alias("l"),
        F.col("_b0").alias("b"),
        F.transform(
            F.sequence(F.lit(1), p),
            lambda i: xs_safe(i) - F.col("_m1"),
        ).alias("s"),
    )

    def step(acc, t):
        phase0 = (t - 1) % p  # 0-based slot into the seasonal array
        s_old = F.element_at(acc["s"], phase0 + 1)
        x = xs_safe(t)
        lnew = al * (x - s_old) + (one - al) * (acc["l"] + acc["b"])
        bnew = be * (lnew - acc["l"]) + (one - be) * acc["b"]
        snew = ga * (x - lnew) + (one - ga) * s_old
        return F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            F.transform(
                acc["s"],
                lambda v, i0: F.when(i0 == phase0, snew).otherwise(v),
            ).alias("s"),
        )

    # Spark's sequence(a, b) DESCENDS when a > b: short groups must
    # fold over an empty range, not a reversed one
    fold_range = F.when(
        nloc >= p + 1, F.sequence(p + 1, nloc)
    ).otherwise(F.array().cast("array<int>"))
    acc = F.aggregate(fold_range, init, step)
    next_phase0 = nloc % p
    fc = (
        acc["l"]
        + acc["b"]
        + F.element_at(acc["s"], next_phase0 + 1)
    )
    ok = F.col("n") >= 2 * period
    return s1.select(
        *by,
        "n",
        F.when(ok, acc["l"]).alias("level"),
        F.when(ok, acc["b"]).alias("trend"),
        F.when(ok, fc).alias("forecast"),
    )


def kpss_level(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    lags: int = 4,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, lrv, eta_kpss)`` — the KPSS level-stationarity
    test (L339): the mirror image of Dickey-Fuller (L287) — H0 is
    STATIONARY here, so running both corners a series (DF rejects +
    KPSS accepts → stationary; DF accepts + KPSS rejects → unit
    root; both reject → neither model fits):

        e_t = x_t − x̄,   S_t = Σ_{i≤t} e_i,
        η = (1/n²)·Σ_t S_t²  /  σ̂²_lrv

    with the Bartlett long-run variance σ̂²_lrv = γ̂₀ + 2·Σ_{j≤l}
    (1 − j/(l+1))·γ̂ⱼ (compare η against 0.463 at 5% / 0.739 at 1%,
    level case).  Nothing here ever divides row-side: with the
    denominator cleared, d_t = n·x_t − Σx and P_t = n·C_t − t·Σx
    (C_t the exact prefix sum) are exact decimals, and the three
    statistic pieces expand into order-insensitive exact sums —

        Σ d_t·d_{t−j} = n²·Σx_t x_{t−j} − nS·Σ(x_t+x_{t−j}) + (n−j)S²
        Σ P_t²        = n²·ΣC_t² − 2nS·Σ t·C_t + S²·n(n+1)(2n+1)/6

    — so the whole test is one keyed window pass (prefix sum, row
    number, ``lags`` lag columns) + one combinable agg + one fixed
    IEEE tree.  η = ΣP² / (n·(D₀ + 2Σwⱼ Dⱼ)).  Exactness bound:
    prefix sums and lag products square at (18,s) — |C_t| must stay
    below 10^(16−s) (loudly larger than any per-key series this
    engine aggregates).  NULLs refused; n < lags+2 or zero long-run
    variance → NULL η.

    Scale shape: one keyed window pass + one combinable agg — the
    dickey_fuller shuffle shape exactly.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not 0 <= int(lags) <= 20:
        raise ValueError("kpss_level: lags must be in 0..20")
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"kpss_level: {n_null} NULL value(s) — impute first"
            )
    lags = int(lags)
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wc = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xd = F.col(value_col).cast(dec)
    rows = df.select(
        *by,
        xd.alias("_x"),
        F.sum(xd).over(wc).cast(dec).alias("_c"),
        F.row_number().over(wt).cast("decimal(10,0)").alias("_t"),
        *[
            F.lag(xd, j).over(wt).alias(f"_xl{j}")
            for j in range(1, lags + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
        F.sum(F.col("_c") * F.col("_c")).alias("_u"),
        F.sum(F.col("_t") * F.col("_c")).alias("_v"),
    ]
    for j in range(1, lags + 1):
        xl = F.col(f"_xl{j}")
        aggs.append(F.sum(F.col("_x") * xl).alias(f"_a{j}"))
        aggs.append(F.sum(F.col("_x") + xl).alias(f"_b{j}"))
    agg = rows.groupBy(*by).agg(*aggs)
    nd = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    q = F.col("_q").cast("double")
    u = F.col("_u").cast("double")
    v = F.col("_v").cast("double")
    w_sq = nd * (nd + F.lit(1.0)) * (
        F.lit(2.0) * nd + F.lit(1.0)
    ) / F.lit(6.0)
    sp2 = nd * nd * u - F.lit(2.0) * nd * s * v + s * s * w_sq
    d0 = nd * nd * q - nd * s * s
    lrv_num = d0
    for j in range(1, lags + 1):
        aj = F.coalesce(F.col(f"_a{j}").cast("double"), F.lit(0.0))
        bj = F.coalesce(F.col(f"_b{j}").cast("double"), F.lit(0.0))
        dj = nd * nd * aj - nd * s * bj + (nd - F.lit(float(j))) * s * s
        wj = 1.0 - j / (lags + 1.0)
        lrv_num = lrv_num + F.lit(2.0 * wj) * dj
    lrv = lrv_num / (nd * nd * nd)
    ok = (F.col("n") >= lags + 2) & (lrv_num > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok, lrv).alias("lrv"),
        F.when(ok, sp2 / (nd * lrv_num)).alias("eta_kpss"),
    )


def variance_ratio(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    q: int = 4,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, vr, z_vr)`` — the Lo-MacKinlay variance-ratio
    test (L340): does variance grow LINEARLY with the horizon, the
    defining fingerprint of a random walk (VR(q)≈1) vs mean
    reversion (VR<1) or trending/momentum (VR>1) — the standard
    "is this series predictable at horizon q" screen on returns:

        σ̂²(1) = (1/n)·Σ(r_t − μ̂)²
        σ̂²(q) = (1/(n·q))·Σ_{t≥q}(r_t + … + r_{t−q+1} − q·μ̂)²
        VR = σ̂²(q)/σ̂²(1),
        z = √n·(VR−1)/√(2(2q−1)(q−1)/(3q))   (homoskedastic form)

    The overlapping q-sums W_t come from ONE rolling window of exact
    decimals (order-insensitive), and the mean corrections expand —
    Σ(W−qμ)² = ΣW² − 2qμ·ΣW + m·q²μ² with m = n−q+1 — so the test
    is one keyed window pass + one combinable agg + one fixed IEEE
    tree (the L287 discipline).  Same (18,s) squaring bound as
    kpss_level.  NULLs refused; q < 2, n < q+2, or zero one-period
    variance → NULL.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if int(q) < 2:
        raise ValueError("variance_ratio: q must be >= 2")
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"variance_ratio: {n_null} NULL value(s) — impute first"
            )
    q = int(q)
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wq = wt.rowsBetween(-(q - 1), Window.currentRow)
    xd = F.col(value_col).cast(dec)
    rows = df.select(
        *by,
        xd.alias("_x"),
        F.sum(xd).over(wq).cast(dec).alias("_w"),
        F.row_number().over(wt).alias("_t"),
    )
    full = F.col("_t") >= q
    agg = rows.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_qq"),
        F.sum(F.when(full, F.col("_w"))).alias("_sw"),
        F.sum(F.when(full, F.col("_w") * F.col("_w"))).alias("_sww"),
    )
    nd = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    sq = F.col("_qq").cast("double")
    sw = F.coalesce(F.col("_sw").cast("double"), F.lit(0.0))
    sww = F.coalesce(F.col("_sww").cast("double"), F.lit(0.0))
    qd = F.lit(float(q))
    mu = s / nd
    m = nd - qd + F.lit(1.0)
    var1 = (sq - s * s / nd) / nd
    num = sww - F.lit(2.0) * qd * mu * sw + m * qd * qd * mu * mu
    varq = num / (nd * qd)
    vr = varq / var1
    z_den = F.sqrt(
        F.lit(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q))
    )
    ok = (F.col("n") >= q + 2) & (var1 > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok, vr).alias("vr"),
        F.when(ok, F.sqrt(nd) * (vr - F.lit(1.0)) / z_den).alias(
            "z_vr"
        ),
    )


def risk_panel(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    periods: int = 252,
    mar: float = 0.0,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, sharpe, sortino, mdd, calmar)`` — the
    risk-adjusted performance panel (L341) over a per-period RETURN
    series (additive/log convention): the three ratios every
    portfolio/strategy/SLO-burn dashboard puts side by side, because
    each divides the same mean by a DIFFERENT pain measure:

        Sharpe  = √periods · μ̂ / s        (s = sample sd, n−1)
        Sortino = √periods · μ̂ / d        (d = √(Σ min(r−MAR,0)²/n),
                                            population downside dev)
        Calmar  = periods · μ̂ / MDD       (MDD of the CUMULATIVE
                                            return curve, L314 form)

    Σr, Σr², Σmin(r−MAR,0)² are exact decimals (MAR must be
    representable at ``scale`` — it subtracts BEFORE the clamp), the
    cumulative curve and its running peak are exact prefix windows,
    and each ratio is one fixed IEEE tree.  NULLs refused; n < 2 or
    zero sd / downside / drawdown → NULL for that ratio only (a
    never-losing series has a Sharpe but no Sortino — by design).

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"risk_panel: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    mard = F.lit(mar).cast(dec)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wc = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.select(
        *by,
        *order_cols,
        xd.alias("_x"),
        F.least(xd - mard, F.lit(0).cast(dec)).cast(dec).alias("_dn"),
        F.sum(xd).over(wc).cast(dec).alias("_c"),
    )
    staged = staged.select(
        *by, "_x", "_dn", "_c",
        F.max("_c").over(wc).alias("_peak"),
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
        F.sum(F.col("_dn") * F.col("_dn")).alias("_d2"),
        F.max(F.col("_peak") - F.col("_c")).alias("_mdd"),
    )
    nd = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    q = F.col("_q").cast("double")
    d2 = F.col("_d2").cast("double")
    mddd = F.col("_mdd").cast("double")
    mu = s / nd
    sd_sq = (q - s * s / nd) / (nd - F.lit(1.0))
    ddev = F.sqrt(d2 / nd)
    sqp = F.sqrt(F.lit(float(periods)))
    return agg.select(
        *by,
        "n",
        F.when(
            (F.col("n") >= 2) & (sd_sq > 0.0),
            sqp * mu / F.sqrt(sd_sq),
        ).alias("sharpe"),
        F.when((F.col("n") >= 2) & (d2 > 0), sqp * mu / ddev).alias(
            "sortino"
        ),
        mddd.alias("mdd"),
        F.when(
            (F.col("n") >= 2) & (F.col("_mdd") > 0),
            mu * F.lit(float(periods)) / mddd,
        ).alias("calmar"),
    )


def omega_ratio(
    df: DataFrame,
    by: list[str],
    value_col: str,
    threshold: float = 0.0,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, n_above, upside, downside, omega)`` — the Omega
    ratio (L342): the WHOLE-distribution gain/loss measure —
    probability-weighted upside over downside around a threshold θ,
    using every moment at once where Sharpe uses two:

        Ω(θ) = Σ (r−θ)⁺ / Σ (θ−r)⁺

    Both partial sums are exact decimals (θ must be representable at
    ``scale``), so Ω is ONE division — and at θ=0 it doubles as the
    profit factor.  NULLs refused; zero downside → NULL (a
    never-losing series has no finite Ω).

    Scale shape: one combinable agg — no window, no shuffle beyond
    the groupBy.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"omega_ratio: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    thd = F.lit(threshold).cast(dec)
    zero = F.lit(0).cast(dec)
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(value_col).cast(dec) > thd).cast("long")).alias(
            "n_above"
        ),
        F.sum(F.greatest(xd - thd, zero)).alias("_up"),
        F.sum(F.greatest(thd - xd, zero)).alias("_dn"),
    )
    up = F.col("_up").cast("double")
    dn = F.col("_dn").cast("double")
    return agg.select(
        *by,
        "n",
        "n_above",
        up.alias("upside"),
        dn.alias("downside"),
        F.when(F.col("_dn") > 0, up / dn).alias("omega"),
    )


def kalman_level(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    q_var: float,
    r_var: float,
    p0: float = 1e6,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., n, level, p_var, k_last)`` — the local-level Kalman
    filter (L347): the optimal online "true level under noise"
    tracker, the state-space generalization of EWMA whose gain ADAPTS
    — large while uncertain, settling to the steady-state signal/noise
    balance — instead of being a fixed α:

        predict:  P⁻ = P + q
        gain:     K  = P⁻ / (P⁻ + r)
        update:   a += K·(xₜ − a),   P = (1−K)·P⁻

    initialized diffusely (a₁ = x₁, P₁ = p0) and folded over
    t = 2..n with an (a, P, K) struct accumulator — every step the
    same four IEEE ops in both engines, so the filter is
    value-oracle-able with no rounding grid.  Emits the final state:
    the filtered level, its variance, and the last gain (the
    steady-state gain for any series long enough to converge).
    NULLs and duplicate order keys refused; q, r must be > 0.

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold (the L272/L333 discipline).

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if not (float(q_var) > 0.0 and float(r_var) > 0.0):
        raise ValueError("kalman_level: q_var and r_var must be > 0")
    if float(p0) < 0.0:
        raise ValueError("kalman_level: p0 must be >= 0")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(f"kalman_level: {n_null} NULL value(s)")
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"kalman_level: {dups} duplicate order key(s)"
            )
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    qv = F.lit(float(q_var))
    rv = F.lit(float(r_var))
    init = F.struct(
        F.element_at(F.col("_xs"), 1).alias("a"),
        F.lit(float(p0)).alias("p"),
        F.lit(None).cast("double").alias("k"),
    )

    def step(acc, t):
        x = F.element_at(F.col("_xs"), t)
        ppred = acc["p"] + qv
        k = ppred / (ppred + rv)
        anew = acc["a"] + k * (x - acc["a"])
        pnew = (F.lit(1.0) - k) * ppred
        return F.struct(
            anew.alias("a"), pnew.alias("p"), k.alias("k")
        )

    fold_range = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    acc = F.aggregate(fold_range, init, step)
    return staged.select(
        *by,
        n.alias("n"),
        acc["a"].alias("level"),
        acc["p"].alias("p_var"),
        acc["k"].alias("k_last"),
    )


def engle_granger(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    y_col: str,
    x_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, alpha, beta, rho, t_eg)`` — the Engle-Granger
    two-step cointegration test (L348): do two trending series share
    ONE common trend (pairs trading, replica-lag vs load, any
    "these two metrics should move together" claim):

        step 1:  y = α + β·x + u          (OLS, L135 exact sums)
        step 2:  Δuₜ = ρ·uₜ₋₁ + εₜ        (no-constant DF on the
                                            residuals; t_EG = ρ/se —
                                            compare vs ≈ −3.34 at 5%)

    The residuals are never materialized: since Δu = Δy − β·Δx (α
    cancels) and uₜ₋₁ = yₜ₋₁ − α − β·xₜ₋₁, every step-2 sum expands
    into a polynomial in (α, β) whose coefficients are EXACT decimal
    lagged cross-sums — Σuₚ², ΣuₚΔu, ΣΔu² each one fixed IEEE tree
    over the same 13-sum aggregation, so the whole two-step test is
    ONE keyed window pass + ONE combinable agg.  SSE via the
    no-constant identity ΣΔu² − ρ·ΣuₚΔu.  NULLs refused; n < 4,
    zero x-variance, or zero residual energy → NULL.

    Scale shape: one keyed window pass + one combinable agg — the
    dickey_fuller shuffle shape, with the OLS riding along free.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(y_col).isNull() | F.col(x_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"engle_granger: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    yd = F.col(y_col).cast(dec)
    xd = F.col(x_col).cast(dec)
    rows = df.select(
        *by,
        yd.alias("_y"),
        xd.alias("_x"),
        F.lag(yd, 1).over(wt).alias("_yp"),
        F.lag(xd, 1).over(wt).alias("_xp"),
    )
    dy = (F.col("_y") - F.col("_yp")).cast(dec)
    dx = (F.col("_x") - F.col("_xp")).cast(dec)
    has_lag = F.col("_yp").isNotNull()
    agg = rows.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.when(has_lag, F.col("_yp"))).alias("_syp"),
        F.sum(F.when(has_lag, F.col("_xp"))).alias("_sxp"),
        F.sum(F.when(has_lag, F.col("_yp") * F.col("_yp"))).alias("_sypp"),
        F.sum(F.when(has_lag, F.col("_xp") * F.col("_xp"))).alias("_sxpp"),
        F.sum(F.when(has_lag, F.col("_xp") * F.col("_yp"))).alias("_sxyp"),
        F.sum(F.when(has_lag, dy * dy)).alias("_sdy2"),
        F.sum(F.when(has_lag, dx * dx)).alias("_sdx2"),
        F.sum(F.when(has_lag, dx * dy)).alias("_sdxy"),
        F.sum(F.when(has_lag, dy)).alias("_sdy"),
        F.sum(F.when(has_lag, dx)).alias("_sdx"),
        F.sum(F.when(has_lag, F.col("_yp") * dy)).alias("_sypdy"),
        F.sum(F.when(has_lag, F.col("_yp") * dx)).alias("_sypdx"),
        F.sum(F.when(has_lag, F.col("_xp") * dy)).alias("_sxpdy"),
        F.sum(F.when(has_lag, F.col("_xp") * dx)).alias("_sxpdx"),
    )
    nd = F.col("n").cast("double")

    def d(c):
        return F.coalesce(F.col(c).cast("double"), F.lit(0.0))

    sx, sy, sxx, sxy = d("_sx"), d("_sy"), d("_sxx"), d("_sxy")
    syp, sxp = d("_syp"), d("_sxp")
    sypp, sxpp, sxyp = d("_sypp"), d("_sxpp"), d("_sxyp")
    sdy2, sdx2, sdxy = d("_sdy2"), d("_sdx2"), d("_sdxy")
    sdy, sdx = d("_sdy"), d("_sdx")
    sypdy, sypdx = d("_sypdy"), d("_sypdx")
    sxpdy, sxpdx = d("_sxpdy"), d("_sxpdx")
    varx = nd * sxx - sx * sx
    b = F.when(varx > 0.0, (nd * sxy - sx * sy) / varx)
    a = (sy - b * sx) / nd
    m = nd - F.lit(1.0)
    upp = (
        sypp
        - F.lit(2.0) * a * syp
        - F.lit(2.0) * b * sxyp
        + a * a * m
        + F.lit(2.0) * a * b * sxp
        + b * b * sxpp
    )
    updu = (
        sypdy
        - b * sypdx
        - a * sdy
        + a * b * sdx
        - b * sxpdy
        + b * b * sxpdx
    )
    du2 = sdy2 - F.lit(2.0) * b * sdxy + b * b * sdx2
    rho = F.when(upp > 0.0, updu / upp)
    sse = du2 - rho * updu
    se = F.when(
        (upp > 0.0) & (m > 1.0) & (sse > 0.0),
        F.sqrt(sse / (m - F.lit(1.0)) / upp),
    )
    ok = (F.col("n") >= 4) & (varx > 0.0)
    ok2 = ok & (upp > 0.0) & (sse > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok, a).alias("alpha"),
        F.when(ok, b).alias("beta"),
        F.when(ok & (upp > 0.0), rho).alias("rho"),
        F.when(ok2, rho / se).alias("t_eg"),
    )


def ar1_fit(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_pairs, phi, intercept, mu_lr, half_life)`` — AR(1)
    fit panel (L353): the one-number memory model — persistence φ,
    the long-run mean the series reverts TO, and the half-life it
    reverts WITH (the number capacity planning and pairs-trading
    actually use):

        xₜ = c + φ·xₜ₋₁ + εₜ      (OLS over the lag pairs)
        μ_LR = c/(1−φ)             (|φ| < 1, else NULL)
        t½  = −ln 2 / ln φ         (0 < φ < 1, else NULL — an
                                    oscillating or explosive series
                                    has no reversion half-life)

    The five OLS sufficient sums are exact decimals from ONE lag
    window (the L287 discipline); φ/c/μ/t½ are one fixed IEEE tree.
    NULLs refused; n_pairs < 3 or zero lag-variance → NULL panel.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; forecasting analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"ar1_fit: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    xd = F.col(value_col).cast(dec)
    lagged = df.select(
        *by,
        xd.alias("_y"),
        F.lag(xd, 1).over(wt).alias("_xp"),
    ).filter(F.col("_xp").isNotNull())
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_xp").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_xp") * F.col("_xp")).alias("_sxx"),
        F.sum(F.col("_xp") * F.col("_y")).alias("_sxy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    varn = nd * sxx - sx * sx
    phi = F.when(varn > 0.0, (nd * sxy - sx * sy) / varn)
    c = (sy - phi * sx) / nd
    ok = (F.col("n_pairs") >= 3) & (varn > 0.0)
    mu = F.when(
        ok & (phi < 1.0) & (phi > -1.0), c / (F.lit(1.0) - phi)
    )
    hl = F.when(
        ok & (phi > 0.0) & (phi < 1.0),
        -F.log(F.lit(2.0)) / F.log(phi),
    )
    return agg.select(
        *by,
        "n_pairs",
        F.when(ok, phi).alias("phi"),
        F.when(ok, c).alias("intercept"),
        mu.alias("mu_lr"),
        hl.alias("half_life"),
    )


def capm_panel(
    df: DataFrame,
    by: list[str],
    asset_col: str,
    market_col: str,
    scale: int = 6,
) -> DataFrame:
    """CAPM / benchmark-relative panel (L383): ``(by..., n, beta,
    alpha, r2, tracking_error, information_ratio)`` — the
    active-management scoreboard the absolute-risk L341 panel can't
    give: regress each key's per-period return on the benchmark's,

        beta  = Cov(a,m)/Var(m)         (market sensitivity)
        alpha = ā − beta·m̄              (excess per period, Jensen)
        TE    = sample std of (a − m)   (how far from the benchmark)
        IR    = mean(a − m) / TE        (is the deviation paying)

    Rows carry BOTH returns (the caller aligns periods — an as-of or
    equi-join upstream; misaligned rows are NULL-dropped here).  All
    five sufficient statistics are exact DECIMAL sums; the diff sums
    need no extra pass (Σd = Σa − Σm and Σd² = Σa² − 2Σam + Σm² are
    exact decimal identities, computed so).  Values are per-period —
    annualization is a caller-side multiply, pinned out of the op.
    NULL beta/alpha/r2 when n < 2 or Var(m) = 0 (a flat benchmark
    has no beta); NULL r2 additionally when Var(a) = 0; NULL IR when
    TE = 0 (a perfect tracker's IR is undefined, not infinite).

    Scale shape: ONE map-side-combinable groupBy over five sums —
    the L135 shape; 100 TB scanned once.

    No reference counterpart; finance analytics per SURVEY §2.11
    (composes with L341 risk_panel and L314/L384 drawdown ops)."""
    dec = f"decimal(18,{scale})"
    ad = F.col(asset_col).cast(dec)
    md = F.col(market_col).cast(dec)
    agg = (
        df.filter(
            F.col(asset_col).isNotNull() & F.col(market_col).isNotNull()
        )
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(ad).alias("_sa"),
            F.sum(md).alias("_sm"),
            F.sum(ad * ad).alias("_saa"),
            F.sum(md * md).alias("_smm"),
            F.sum(ad * md).alias("_sam"),
        )
    )
    nd = F.col("n").cast("double")
    sa = F.col("_sa").cast("double")
    sm = F.col("_sm").cast("double")
    saa = F.col("_saa").cast("double")
    smm = F.col("_smm").cast("double")
    sam = F.col("_sam").cast("double")
    cov_n = nd * sam - sa * sm
    varm_n = nd * smm - sm * sm
    vara_n = nd * saa - sa * sa
    fit_ok = (F.col("n") >= 2) & (varm_n > F.lit(0.0))
    beta = F.when(fit_ok, cov_n / varm_n)
    alpha = F.when(fit_ok, (sa - (cov_n / varm_n) * sm) / nd)
    r2 = F.when(
        fit_ok & (vara_n > F.lit(0.0)),
        (cov_n * cov_n) / (varm_n * vara_n),
    )
    # diff sums as exact-decimal identities, then the sample variance
    sd_ = (F.col("_sa") - F.col("_sm")).cast("double")
    sdd = (
        F.col("_saa") - F.lit(2) * F.col("_sam") + F.col("_smm")
    ).cast("double")
    te_var = (nd * sdd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    te = F.when((F.col("n") >= 2) & (te_var > F.lit(0.0)), F.sqrt(te_var))
    return agg.select(
        *by,
        "n",
        beta.alias("beta"),
        alpha.alias("alpha"),
        r2.alias("r2"),
        te.alias("tracking_error"),
        F.when(te.isNotNull(), (sd_ / nd) / te).alias(
            "information_ratio"
        ),
    )


def ulcer_index(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
    max_len: int = 100_000,
) -> DataFrame:
    """Ulcer index panel (L384): ``(by..., n, ulcer_index,
    pain_index, max_dd_pct)`` — drawdown-shaped risk (Martin & McCann
    1989): where L341's Sortino penalizes downside VOLATILITY and
    L314 reports only the single worst fall, the ulcer index
    penalizes DEPTH × DURATION of all underwater stretches:

        d_t        = 100·(x_t − peak_t)/peak_t      (≤ 0, in %)
        ulcer      = √(Σ d_t²/n)
        pain_index = Σ(−d_t)/n                      (mean % underwater)
        max_dd_pct = −min_t d_t

    The running peak is one prefix-max window over exact decimals
    (the L314 discipline), so each d_t is one fixed IEEE tree; the
    d² and |d| sums are float sums and therefore fold in ascending
    ``order_cols`` order over the collected series — BOUNDED by
    ``max_len`` (REFUSED beyond; the L180 contract) so the pinned
    order is a real guarantee, not a hope.  ``max_dd_pct`` needs no
    fold (min is order-insensitive).  Non-positive values REFUSED
    (a % drawdown below a 0 peak is undefined — scale the curve
    first).

    Scale shape: one keyed window pass + one bounded collect-fold
    per key; keys parallelize across the cluster.

    No reference counterpart; finance analytics per SURVEY §2.11."""
    if validation_enabled():
        n_bad = df.filter(
            F.col(value_col).isNull() | (F.col(value_col) <= 0)
        ).count()
        if n_bad:
            raise ValueError(
                f"ulcer_index: {n_bad} NULL or non-positive value(s) — "
                "percentage drawdowns need a positive curve"
            )
    sizes = df.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"ulcer_index: a series exceeds max_len={max_len} — the "
                "float sums fold in pinned order; bucket or split first"
            )
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    wt = Window.partitionBy(*by).orderBy(*[F.col(c) for c in order_cols])
    wp = wt.rowsBetween(Window.unboundedPreceding, 0)
    staged = df.select(
        *by,
        F.row_number().over(wt).alias("_t"),
        (
            F.lit(100.0)
            * (xd.cast("double") - F.max(xd).over(wp).cast("double"))
            / F.max(xd).over(wp).cast("double")
        ).alias("_d"),
    )
    arr = F.sort_array(F.collect_list(F.struct("_t", "_d")))
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_d").alias("_mind"),
        F.aggregate(
            arr, F.lit(0.0), lambda a, x: a + x["_d"] * x["_d"]
        ).alias("_ss"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a - x["_d"]).alias(
            "_sa"
        ),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        *by,
        "n",
        F.sqrt(F.col("_ss") / nd).alias("ulcer_index"),
        (F.col("_sa") / nd).alias("pain_index"),
        (-F.col("_mind")).alias("max_dd_pct"),
    )


def count_dispersion(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Count-dispersion panel (L388): ``(by..., n_events, n_buckets,
    n_active_buckets, mean_per_bucket, fano, burstiness)`` — is an
    event stream Poisson-regular, clumped, or over-dispersed?  Events
    are counted into fixed ``bucket_seconds`` buckets on the exact
    integer MICROsecond grid (the L182 discipline) and the panel
    summarizes the per-bucket count distribution over the OBSERVED
    span (min..max bucket inclusive — interior empty buckets count as
    zeros without ever being materialized; lead/tail emptiness is
    unknowable and excluded, documented):

        fano       = Var(c)/Mean(c) = (n·Σc² − (Σc)²) / (n·Σc)
        burstiness = (σ−μ)/(σ+μ)    = (√D − Σc) / (√D + Σc)

    with D = n·Σc² − (Σc)² — population variance, and the 1/n factors
    cancelled ALGEBRAICALLY before any IEEE op, so fano is one
    division over exact integers and burstiness one sqrt + one
    division (Poisson → fano ≈ 1, B ≈ 0⁻; periodic → fano → 0,
    B → −1; clumped → fano ≫ 1, B → 1).  A single-bucket group gets
    fano 0 / burstiness −1 (zero variance, by the math — documented).
    NULL timestamps and pre-epoch (negative-µs) timestamps are
    REFUSED loudly (truncation direction differs across engines
    below zero; a timeless event is a data bug here).

    Scale shape: one combinable groupBy onto (by, bucket) then one
    combinable groupBy onto (by) — two map-side-combinable exchanges,
    no window, no sort; exact DECIMAL(38,0) squares, ANSI-loud on
    overflow.

    No reference counterpart; analytics per SURVEY §2.11 (completes
    the L151 ACF / L132 Markov "stream regularity" family)."""
    if bucket_seconds <= 0:
        raise ValueError("count_dispersion: bucket_seconds must be > 0")
    if validation_enabled():
        n_null = df.filter(F.col(ts_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"count_dispersion: {n_null} NULL timestamp(s) in "
                f"{ts_col!r} — drop or repair first"
            )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(*by, us.alias("_us"))
    if validation_enabled():
        n_neg = base.filter(F.col("_us") < 0).count()
        if n_neg:
            raise ValueError(
                f"count_dispersion: {n_neg} pre-epoch timestamp(s) in "
                f"{ts_col!r} — integer bucket truncation is not floor "
                "below zero"
            )
    w_us = bucket_seconds * 1_000_000
    counts = base.select(
        *by, F.expr(f"_us DIV {w_us}").alias("_b")
    ).groupBy(*by, "_b").agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy(*by).agg(
        F.sum("_c").alias("_s"),
        F.sum(
            F.col("_c").cast("decimal(18,0)")
            * F.col("_c").cast("decimal(18,0)")
        ).alias("_q"),
        F.count(F.lit(1)).alias("n_active_buckets"),
        F.min("_b").alias("_bmin"),
        F.max("_b").alias("_bmax"),
    )
    n = F.col("_bmax") - F.col("_bmin") + F.lit(1)
    nd = n.cast("decimal(19,0)")
    s_dec = F.col("_s").cast("decimal(19,0)")
    d = nd.cast("decimal(38,0)") * F.col("_q").cast("decimal(38,0)") - (
        s_dec.cast("decimal(38,0)") * s_dec.cast("decimal(38,0)")
    )
    sqrt_d = F.sqrt(d.cast("double"))
    s_dbl = F.col("_s").cast("double")
    return agg.select(
        *by,
        F.col("_s").alias("n_events"),
        n.alias("n_buckets"),
        "n_active_buckets",
        (s_dbl / n.cast("double")).alias("mean_per_bucket"),
        (
            d.cast("double")
            / (nd * s_dec).cast("double")
        ).alias("fano"),
        ((sqrt_d - s_dbl) / (sqrt_d + s_dbl)).alias("burstiness"),
    )


def crps_ensemble(
    df: DataFrame,
    by: list[str],
    case_col: str,
    member_col: str,
    obs_col: str,
    scale: int = 2,
    max_members: int = 1024,
) -> DataFrame:
    """CRPS for ensemble forecasts (L401): ``(by..., n_cases,
    m_min, m_max, mean_crps, mean_mae)`` — the PROBABILISTIC forecast
    score completing the point-forecast family (MAE/RMSE/WAPE/MASE
    L206, pinball L286 scores one quantile; CRPS scores the whole
    predictive distribution, Gneiting & Raftery 2007 sample form):

        CRPS = (1/m)Σᵢ|xᵢ−y| − (1/2m²)ΣᵢΣⱼ|xᵢ−xⱼ|

    per case (ensemble members xᵢ, observation y).  The double sum
    collapses by the sorted-rank identity Σᵢ<ⱼ(xⱼ−xᵢ) =
    Σᵢ(2i−1−m)·xᵢ — so the whole statistic is TWO exact decimal sums
    per case (one rank window; ties are safe — tied values get
    interchangeable weights whose total is order-free) and ONE
    division: crps_case = (m·A − B)/m² with A = Σ|x−y|, B the rank
    sum, all exact.  NO pair lattice, NO collect — fully relational,
    a 100 TB ensemble table takes one window + two combinable aggs.

    The group mean over cases is the macro convention: per-case
    scores are quantized half-up onto the 1e-9 grid and summed as
    exact decimals (ragged ensemble sizes make a common denominator
    impossible — the grid IS the contract, the L390 discipline).
    ``mean_mae`` (= mean A/m, the implied deterministic-forecast
    score; CRPS ≤ MAE always) rides along for the sharpness gap.

    Refusals: NULL members/observations; an observation that VARIES
    within a case (a broken join, not an ensemble); ensembles wider
    than ``max_members``.

    No reference counterpart; forecast-eval analytics per SURVEY
    §2.11."""
    dec = f"decimal(18,{scale})"
    if validation_enabled():
        n_null = df.filter(
            F.col(member_col).isNull() | F.col(obs_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"crps_ensemble: {n_null} NULL member/observation row(s)"
            )
    base = df.select(
        *by,
        F.col(case_col).alias("_case"),
        F.col(member_col).cast(dec).alias("_x"),
        F.col(obs_col).cast(dec).alias("_y"),
    )
    chk = base.groupBy(*by, "_case").agg(
        F.countDistinct("_y").alias("_ny"),
        F.count(F.lit(1)).alias("_m"),
    )
    if validation_enabled():
        multi = chk.filter(F.col("_ny") > 1).count()
        if multi:
            raise ValueError(
                f"crps_ensemble: {multi} case(s) with a non-constant "
                "observation — that is a broken join, not an ensemble"
            )
    if validation_enabled():
        wide = chk.filter(F.col("_m") > max_members).count()
        if wide:
            raise ValueError(
                f"crps_ensemble: {wide} case(s) wider than max_members="
                f"{max_members}"
            )
    w = Window.partitionBy(*by, "_case").orderBy("_x")
    wd = "decimal(38,6)"
    ranked = base.withColumn("_i", F.row_number().over(w)).withColumn(
        "_mc", F.count(F.lit(1)).over(Window.partitionBy(*by, "_case"))
    )
    per_case = ranked.groupBy(*by, "_case").agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(F.abs(F.col("_x") - F.col("_y"))).alias("_a"),
        F.sum(
            (F.lit(2) * F.col("_i") - F.lit(1) - F.col("_mc")).cast(wd)
            * F.col("_x").cast(wd)
        ).alias("_b"),
    )
    md = F.col("_m").cast("double")
    crps = (
        (F.col("_m").cast(wd) * F.col("_a").cast(wd)).cast("double")
        - F.col("_b").cast("double")
    ) / (md * md)
    mae = F.col("_a").cast("double") / md
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    agg = per_case.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_cases"),
        F.min("_m").alias("m_min"),
        F.max("_m").alias("m_max"),
        F.sum(q(crps)).alias("_qc"),
        F.sum(q(mae)).alias("_qm"),
    )
    nd = F.col("n_cases").cast("double")
    return agg.select(
        *by,
        "n_cases",
        "m_min",
        "m_max",
        (F.col("_qc").cast("double") / F.lit(1e9) / nd).alias(
            "mean_crps"
        ),
        (F.col("_qm").cast("double") / F.lit(1e9) / nd).alias(
            "mean_mae"
        ),
    )


def diebold_mariano(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    loss_a: str,
    loss_b: str,
    max_lag: int,
    scale: int = 4,
) -> DataFrame:
    """Diebold-Mariano forecast-comparison test (L402): ``(by..., n,
    mean_d, se_hac, dm)`` — is forecast A genuinely better than B, or
    is the loss gap serial-correlation noise?  (Diebold & Mariano
    1995: the loss differential dₜ = L_Aₜ − L_Bₜ of competing
    forecasts is itself autocorrelated — h-step-ahead errors overlap
    — so the mean difference must be studentized by the LONG-RUN
    variance, not the iid se.)

    A pure composition: dₜ is the EXACT decimal difference of the two
    loss columns, pushed through the L393 Newey-West machinery
    verbatim (exact centred sums, Bartlett weights as pinned
    literals), and DM = mean(d)/se_hac(d) — one extra division.
    Identical forecasts (zero long-run variance) → NULL dm, not 0/0
    (the L383 discipline).  The loss function (absolute, squared,
    pinball...) is the CALLER's upstream column choice — the test is
    loss-agnostic by construction.  NULL losses refused (lag
    lattice); n < max_lag+2 → NULL se/dm.

    No reference counterpart; forecast-eval analytics per SURVEY
    §2.11 (composes L393; completes L206/L286/L401)."""
    from .concentration import newey_west

    dec = f"decimal(18,{scale})"
    if validation_enabled():
        n_null = df.filter(
            F.col(loss_a).isNull() | F.col(loss_b).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"diebold_mariano: {n_null} NULL loss row(s) — drop or "
                "impute first; silently skipping rows would shift lags"
            )
    base = df.select(
        *by,
        *[c for c in order_cols if c not in by],
        (F.col(loss_a).cast(dec) - F.col(loss_b).cast(dec)).alias("_d"),
    )
    nw = newey_west(base, by, order_cols, "_d", max_lag, scale=scale)
    return nw.select(
        *by,
        "n",
        F.col("mean").alias("mean_d"),
        "se_hac",
        F.when(
            F.col("se_hac") > 0, F.col("mean") / F.col("se_hac")
        ).alias("dm"),
    )


def detect_peaks(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    scale: int = 2,
    max_len: int = 10_000,
) -> DataFrame:
    """Peak detection with prominence (L415): one row per peak
    ``(by..., t, v, prominence)`` — the telemetry/spectrum question
    "where are the spikes and HOW BIG are they really" (a peak on a
    rising baseline is small; prominence measures it against its own
    saddles, the topographic convention scipy popularized):

        peak: v[i] strictly greater than BOTH neighbors (plateaus
        are not peaks — pinned; collapse duplicates upstream)
        prominence(i) = v[i] − max(base_l, base_r), where base_side
        is the MINIMUM between the peak and the nearest strictly
        higher sample on that side (or the series end if none)

    Values ride EXACT DECIMAL(18, scale) — every min/max/subtract in
    the prominence walk is exact, so peaks and prominences are
    bit-identical ungridded.  The walk is an in-row bounded fold per
    peak (O(n) per peak against the ``max_len`` contract).  NULLs
    and duplicate order keys REFUSED (neighbor semantics would be
    nondeterministic).  Endpoints are never peaks.

    Scale shape: one keyed collect (bounded) + in-row folds; series
    parallelize.

    No reference counterpart; analytics per SURVEY §2.11 (completes
    the L314 drawdown / L279 turning-points family — turning points
    COUNT direction changes; this localizes and sizes them)."""
    from .validate import validation_enabled

    dec = f"decimal(18,{scale})"
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(f"detect_peaks: {n_null} NULL value(s)")
        if validation_enabled():
            dups = (
                df.groupBy(*by, order_col)
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            if dups:
                raise ValueError(
                    f"detect_peaks: {dups} duplicate order key(s)"
                )
    base = df.select(
        *by,
        F.col(order_col).cast("double").alias("_t"),
        F.col(value_col).cast(dec).alias("_x"),
    )
    if validation_enabled():
        sizes = base.groupBy(*by).count()
        if validation_enabled():
            over = sizes.filter(F.col("count") > max_len).count()
            if over:
                raise ValueError(
                    f"detect_peaks: a series exceeds max_len={max_len} — "
                    "resample first"
                )
    packed = base.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("_t", "_x"))).alias("_a")
    )
    n = F.size("_a")
    v = lambda i: F.element_at(F.col("_a"), i)["_x"]  # noqa: E731
    t = lambda i: F.element_at(F.col("_a"), i)["_t"]  # noqa: E731

    def running_min(seq_from, seq_to):
        return F.aggregate(
            F.sequence(seq_from, seq_to),
            F.lit(None).cast(dec),
            lambda acc, j: F.when(acc.isNull(), v(j)).otherwise(
                F.least(acc, v(j))
            ),
        )

    def peak_struct(i):
        jl = F.aggregate(
            F.sequence(F.lit(1), i - 1),
            F.lit(0),
            lambda acc, j: F.when(v(j) > v(i), F.greatest(acc, j)).otherwise(
                acc
            ),
        )
        jr = F.aggregate(
            F.sequence(i + 1, n),
            n + 1,
            lambda acc, j: F.when(v(j) > v(i), F.least(acc, j)).otherwise(
                acc
            ),
        )
        base_l = running_min(jl + 1, i - 1)
        base_r = running_min(i + 1, jr - 1)
        prom = v(i) - F.greatest(base_l, base_r)
        return F.struct(
            t(i).alias("t"), v(i).alias("v"), prom.alias("prominence")
        )

    cand = F.filter(
        F.when(n >= 3, F.sequence(F.lit(2), n - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: (v(i) > v(i - 1)) & (v(i) > v(i + 1)),
    )
    peaks = packed.select(
        *by,
        F.explode(F.transform(cand, peak_struct)).alias("_p"),
    )
    return peaks.select(
        *by,
        F.col("_p")["t"].alias("t"),
        F.col("_p")["v"].alias("v"),
        F.col("_p")["prominence"].alias("prominence"),
    )


def streak_panel(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Streak panel (L416): ``(by..., n, max_inc_run, max_dec_run,
    max_flat_run, tail_inc_run)`` — longest CONSECUTIVE runs per key
    (growth streaks, losing streaks, stuck-sensor plateaus, plus the
    live streak at the series end): run lengths in ROWS, so a
    monotone stretch of k steps scores k+1; a 1-row series scores 1
    everywhere.  The L219 runs TEST counts sign runs for randomness;
    this panel measures the runs themselves — the dashboard number.

    Pure islands arithmetic: one keyed window sort, strict
    comparisons on EXACT DECIMAL(18, scale) values (float noise is
    the caller's upstream rounding decision, documented), break
    flags, running break counts as island ids, and exact integer
    island lengths — relational end to end, bit-identical, no
    collect, no fold.  NULL values and duplicate order keys REFUSED
    (the lag lattice).

    No reference counterpart; analytics per SURVEY §2.11."""
    dec = f"decimal(18,{scale})"
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(f"streak_panel: {n_null} NULL value(s)")
    if validation_enabled():
        dups = (
            df.groupBy(*by, *order_cols)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(f"streak_panel: {dups} duplicate order key(s)")
    w = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col(value_col).cast(dec)
    base = df.select(*by, *order_cols, x.alias("_x"))
    prev = F.lag("_x").over(w)
    flags = base.select(
        *by,
        *order_cols,
        "_x",
        F.when(prev.isNull() | ~(F.col("_x") > prev), 1)
        .otherwise(0)
        .alias("_bi"),
        F.when(prev.isNull() | ~(F.col("_x") < prev), 1)
        .otherwise(0)
        .alias("_bd"),
        F.when(prev.isNull() | ~(F.col("_x") == prev), 1)
        .otherwise(0)
        .alias("_bf"),
    )
    ids = flags.select(
        *by,
        F.sum("_bi").over(wc).alias("_gi"),
        F.sum("_bd").over(wc).alias("_gd"),
        F.sum("_bf").over(wc).alias("_gf"),
    )
    inc = (
        ids.groupBy(*by, "_gi")
        .agg(F.count(F.lit(1)).alias("_l"))
        .groupBy(*by)
        .agg(
            F.max("_l").alias("max_inc_run"),
            F.max_by("_l", "_gi").alias("tail_inc_run"),
            F.sum("_l").alias("n"),
        )
    )
    dec_ = (
        ids.groupBy(*by, "_gd")
        .agg(F.count(F.lit(1)).alias("_l"))
        .groupBy(*by)
        .agg(F.max("_l").alias("max_dec_run"))
    )
    flat = (
        ids.groupBy(*by, "_gf")
        .agg(F.count(F.lit(1)).alias("_l"))
        .groupBy(*by)
        .agg(F.max("_l").alias("max_flat_run"))
    )
    out = inc.join(dec_, list(by)).join(flat, list(by))
    return out.select(
        *by,
        "n",
        "max_inc_run",
        "max_dec_run",
        "max_flat_run",
        "tail_inc_run",
    )


def freshness_panel(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    stale_after_s: int = 3600,
) -> DataFrame:
    """Partition-freshness panel (L441): ``(by..., n, max_ts, lag_s,
    stale)`` — which feeds/partitions have stopped arriving: per key,
    the newest event and its lag behind the DATASET's newest event
    (the deterministic watermark — never wall-clock "now", the L337
    recency discipline), with ``stale`` decided by an EXACT integer
    microsecond comparison against the pinned threshold (no IEEE
    knife-edge at the boundary).  ``lag_s`` is the one division
    (µs/1e6).  NULL timestamps refused.

    Scale shape: one combinable per-key max + one 1-row global max
    broadcast back.

    No reference counterpart; pipeline-health analytics per SURVEY
    §2.11."""
    if stale_after_s < 0:
        raise ValueError("freshness_panel: stale_after_s must be >= 0")
    if validation_enabled():
        n_null = df.filter(F.col(ts_col).isNull()).count()
        if n_null:
            raise ValueError(f"freshness_panel: {n_null} NULL timestamp(s)")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(*by, us.alias("_us"), F.col(ts_col).alias("_ts"))
    per = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("_us").alias("_mx"),
        F.max("_ts").alias("max_ts"),
    )
    wm = per.agg(F.max("_mx").alias("_wm"))
    out = per.crossJoin(F.broadcast(wm))
    lag_us = F.col("_wm") - F.col("_mx")
    return out.select(
        *by,
        "n",
        "max_ts",
        (lag_us.cast("double") / F.lit(1e6)).alias("lag_s"),
        (lag_us > F.lit(int(stale_after_s) * 1_000_000)).alias(
            "stale"
        ),
    )


def volume_anomaly(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    bucket_seconds: int = 86_400,
    max_buckets: int = 5_000,
) -> DataFrame:
    """Volume-anomaly panel (L442): one row per (key, bucket)
    ``(by..., bucket_start, n, median_n, mad_n, robust_z)`` — did a
    feed's volume spike or collapse: per-bucket exact counts on the
    µs grid (the L388 bucket discipline, interior empty buckets
    counted as ZEROS — a silent day is the anomaly you most need to
    see), scored against the key's own MEDIAN and MAD with the
    pinned floored-index median convention over the bounded sorted
    count list (``max_buckets`` REFUSED loudly):

        robust_z = (n − median) / (1.4826·MAD)

    (the L137 robust screen applied to the volume series itself;
    1.4826 a pinned literal; MAD = 0 — perfectly constant volume —
    → NULL z, documented).  NULL and pre-epoch timestamps refused
    (the L388 rule).

    No reference counterpart; pipeline-health analytics per SURVEY
    §2.11."""
    if bucket_seconds <= 0:
        raise ValueError("volume_anomaly: bucket_seconds must be > 0")
    if validation_enabled():
        n_null = df.filter(F.col(ts_col).isNull()).count()
        if n_null:
            raise ValueError(f"volume_anomaly: {n_null} NULL timestamp(s)")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(*by, us.alias("_us"))
    if validation_enabled():
        n_neg = base.filter(F.col("_us") < 0).count()
        if n_neg:
            raise ValueError(
                f"volume_anomaly: {n_neg} pre-epoch timestamp(s)"
            )
    w_us = bucket_seconds * 1_000_000
    counts = base.select(
        *by, F.expr(f"_us DIV {w_us}").alias("_b")
    ).groupBy(*by, "_b").agg(F.count(F.lit(1)).alias("_c"))
    spans = counts.groupBy(*by).agg(
        F.min("_b").alias("_bmin"), F.max("_b").alias("_bmax")
    )
    n_span = (F.col("_bmax") - F.col("_bmin") + 1).cast("int")
    if validation_enabled():
        over = spans.filter(n_span > max_buckets).count()
        if over:
            raise ValueError(
                f"volume_anomaly: a key spans more than max_buckets="
                f"{max_buckets} buckets — widen bucket_seconds"
            )
    grid = spans.select(
        *by,
        F.explode(
            F.sequence(F.col("_bmin"), F.col("_bmax"))
        ).alias("_b"),
    )
    full = grid.join(counts, [*by, "_b"], "left").select(
        *by, "_b", F.coalesce(F.col("_c"), F.lit(0)).alias("_c")
    )
    packed = full.groupBy(*by).agg(
        F.sort_array(F.collect_list("_c")).alias("_cs")
    )

    def _med(arr):
        k = F.size(arr)
        hi = F.element_at(arr, (F.floor(k / 2) + 1).cast("int"))
        lo = F.element_at(arr, F.floor((k + 1) / 2).cast("int"))
        return F.when(k % 2 == 1, hi.cast("double")).otherwise(
            (lo + hi).cast("double") / F.lit(2.0)
        )

    med = _med(F.col("_cs"))
    devs = F.sort_array(
        F.transform(
            F.col("_cs"), lambda c: F.abs(c.cast("double") - med)
        )
    )

    def _medd(arr):
        k = F.size(arr)
        hi = F.element_at(arr, (F.floor(k / 2) + 1).cast("int"))
        lo = F.element_at(arr, F.floor((k + 1) / 2).cast("int"))
        return F.when(k % 2 == 1, hi).otherwise(
            (lo + hi) / F.lit(2.0)
        )

    stats = packed.select(
        *by, med.alias("median_n"), _medd(devs).alias("mad_n")
    )
    joined = full.join(stats, list(by)) if by else full.crossJoin(
        F.broadcast(stats)
    )
    z = (F.col("_c").cast("double") - F.col("median_n")) / (
        F.lit(1.4826) * F.col("mad_n")
    )
    return joined.select(
        *by,
        F.timestamp_micros(F.col("_b") * F.lit(w_us)).alias(
            "bucket_start"
        ),
        F.col("_c").alias("n"),
        "median_n",
        "mad_n",
        F.when(F.col("mad_n") > 0, z).alias("robust_z"),
    )
