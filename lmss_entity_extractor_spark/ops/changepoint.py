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
from .validate import validation_enabled


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
    if validation_enabled():
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


def pettitt(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n, u_abs, t_index, t_split, stat)`` — the Pettitt
    (1979) nonparametric single-changepoint test per key: a rank-based
    scan for the split point t maximising the Mann-Whitney-style
    statistic between the first t and the remaining n−t observations.

    With r_i the AVERAGE rank of x_i among the key's n values,

        U_t = 2·Σ_{i≤t} r_i − t·(n+1),   t = 1..n−1
        K   = max_t |U_t|,   t̂ = earliest argmax

    Doubled average ranks D_i = 2·r_i = 2·(#below) + (#tied) + 1 are
    exact BIGINTs even under ties (the L146/L174 trick), so
    U_t = Σ_{i≤t} D_i − t·(n+1) is an EXACT integer — the scan needs
    no floats at all.  The only IEEE value is the standardized
    statistic 6·K²/(n³+n²) (the exponent of the classic approximate
    p-value p ≈ 2·exp(−6K²/(n³+n²))), emitted as one fixed tree of
    exactly-rounded ops — bit-identical, ungridded; compare against
    the caller's critical value (e.g. 3.0 ≈ p 0.005).

    NULL order/value rows are refused loudly (they would shift both
    the ranks and the prefix sums).  Keys with n < 2 have no interior
    split point and are omitted.  Ties in |U_t| resolve to the
    EARLIEST t; ``t_split`` is the order-column value AT the split
    (the last row of the left segment).

    Scale shape: one groupBy on (key, value) for the rank grid, one
    equi-join back, one keyed window sort for the prefix scan, one
    combinable argmax agg — two shuffles total, no per-key state
    beyond the window sort.  Bucket/floor continuous values first so
    the per-key distinct-value grid stays bounded (the L159/L174
    discipline); the verdict is insensitive to reasonable bucketing.

    No reference counterpart; drift/monitoring analytics per SURVEY
    §2.11 (composes with CUSUM L154 — CUSUM needs a known target,
    Pettitt hunts an unknown mean shift).
    """
    base = df.select(
        *by, F.col(order_col).alias("_t"), F.col(value_col).alias("_x")
    )
    if validation_enabled():
        n_null = base.filter(F.col("_t").isNull() | F.col("_x").isNull()).count()
        if n_null:
            raise ValueError(
                f"pettitt: {n_null} NULL order/value row(s) — drop or impute "
                "first; skipping rows would shift the ranks and prefix sums"
            )
    pv = base.groupBy(*by, "_x").agg(F.count(F.lit(1)).alias("_cv"))
    wv = (
        Window.partitionBy(*by)
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = pv.withColumn(
        "_d",
        F.lit(2) * F.coalesce(F.sum("_cv").over(wv), F.lit(0))
        + F.col("_cv")
        + F.lit(1),
    )
    rows = base.join(pv.select(*by, "_x", "_d"), [*by, "_x"])
    wk = Window.partitionBy(*by).orderBy("_t")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scanned = rows.select(
        *by,
        "_t",
        F.row_number().over(wk).cast("long").alias("_i"),
        F.sum("_d").over(wkp).alias("_w2"),
        F.count(F.lit(1)).over(wka).alias("_n"),
    )
    u = F.col("_w2") - F.col("_i") * (F.col("_n") + F.lit(1))
    interior = scanned.filter(F.col("_i") < F.col("_n")).select(
        *by,
        F.col("_n").alias("n"),
        F.abs(u).alias("_au"),
        F.col("_i").alias("_ti"),
        F.col("_t").alias("_tv"),
    )
    best = interior.groupBy(*by).agg(
        F.max("n").alias("n"),
        F.max(
            F.struct(
                F.col("_au").alias("a"),
                (-F.col("_ti")).alias("ni"),
                F.col("_tv").alias("tv"),
            )
        ).alias("_b"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("_b.a").cast("double")
    return best.select(
        *by,
        "n",
        F.col("_b.a").alias("u_abs"),
        (-F.col("_b.ni")).alias("t_index"),
        F.col("_b.tv").alias("t_split"),
        (
            (F.lit(6.0) * kd * kd) / (nd * nd * nd + nd * nd)
        ).alias("stat"),
    )


def cusum_squares(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, k_star, d_max, stat)`` — the CUSUM-of-squares
    (ICSS, Inclán & Tiao 1994) VARIANCE-changepoint scan (L299):
    WHERE did the volatility shift — the localization companion to
    the ARCH screen (L290: is variance serially dependent; Pettitt
    L222: where did the LEVEL shift):

        D_k = C_k/C_n − k/n,   C_k = Σ_{i≤k} xᵢ²
        k* = argmax |D_k|,   stat = sqrt(n/2)·|D_k*|

    (compare stat against the Brownian-bridge critical value 1.358 at
    5%).  Squares are EXACT integer micro-units (the L266 trick), so
    every prefix sum is exact; D_k is one fixed tree per row and the
    argmax is a deterministic (|D|, k)-ordered window pick (ties →
    smallest k).  Zero total square mass → NULL.  NULLs refused.

    Scale shape: one keyed window pass (prefix sums + the argmax
    pick) — the L154 shape.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"cusum_squares: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    d0 = "decimal(38,0)"
    q = (F.col(value_col).cast(dec) * F.lit(10**scale)).cast(d0)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wp = wt.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = df.select(
        *by,
        F.row_number().over(wt).alias("_k"),
        F.sum(q * q).over(wp).alias("_ck"),
        F.sum(q * q).over(wa).alias("_cn"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    dk = F.col("_ck").cast("double") / F.col("_cn").cast(
        "double"
    ) - F.col("_k").cast("double") / F.col("_n").cast("double")
    scored = staged.filter(F.col("_cn") > 0).select(
        *by,
        "_k",
        "_n",
        F.abs(dk).alias("_ad"),
    )
    wr = Window.partitionBy(*by).orderBy(
        F.desc("_ad"), F.asc("_k")
    )
    top = scored.select(
        *by, "_k", "_n", "_ad", F.row_number().over(wr).alias("_rn")
    ).filter(F.col("_rn") == 1)
    return top.select(
        *by,
        F.col("_n").alias("n"),
        F.col("_k").alias("k_star"),
        F.col("_ad").alias("d_max"),
        (
            F.sqrt(F.col("_n").cast("double") / F.lit(2.0))
            * F.col("_ad")
        ).alias("stat"),
    )


def page_hinkley(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
    max_len: int = 10_000,
) -> DataFrame:
    """Page-Hinkley sequential drift detector (L394): ``(by..., n,
    mean, ph_inc, t_inc, detect_inc, ph_dec, t_dec, detect_dec)`` —
    the STREAMING member of the changepoint family (CUSUM L154 needs
    a known target mean, Pettitt L222 scans retrospectively; Page-
    Hinkley tracks deviation from the RUNNING mean and alarms the
    moment it drifts — the online-ML drift test, Page 1954 / Hinkley
    1971, the Gama-ML convention):

        x̄ₜ = x̄ₜ₋₁ + (xₜ − x̄ₜ₋₁)/t          (incremental mean)
        mₜ = mₜ₋₁ + (xₜ − x̄ₜ − δ)            (increase side)
        PHₜ = mₜ − min_{s≤t} mₛ ;  alarm when PHₜ > λ

    and symmetrically m′ₜ += (x̄ₜ − xₜ − δ) for decreases.  m₀ =
    min₀ = 0 (pinned convention — the running minimum includes the
    empty prefix).  The whole scan is ONE sequential struct fold per
    key carrying (mean, m, min, ph, t_alarm) for both sides — the
    L347/L371 accumulator discipline — over the max_len-bounded
    sorted series (the L180 contract); ``t_inc``/``t_dec`` are the
    FIRST alarm indices (1-based, NULL when never), ``ph_*`` the
    maximum excursions.  δ ≥ 0 desensitizes, λ > 0 is the alarm
    bar; both are pinned literals so the IEEE tree is identical
    across engines.  NULLs and duplicate order keys REFUSED (fold
    order would be nondeterministic).

    Scale shape: one (keys) groupBy packing the bounded series + one
    in-array fold; keys parallelize — 100 TB of telemetry is many
    monitored series, never one giant one.

    No reference counterpart; analytics per SURVEY §2.11."""
    if float(lam) <= 0.0:
        raise ValueError("page_hinkley: lam must be > 0")
    if float(delta) < 0.0:
        raise ValueError("page_hinkley: delta must be >= 0")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(f"page_hinkley: {n_null} NULL value(s)")
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(f"page_hinkley: {dups} duplicate order key(s)")
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    staged = packed.select(*by, xs.alias("_xs"))
    n = F.size(F.col("_xs"))
    dl = F.lit(float(delta))
    lm = F.lit(float(lam))
    init = F.struct(
        F.lit(0.0).alias("mean"),
        F.lit(0.0).alias("mi"),
        F.lit(0.0).alias("mni"),
        F.lit(0.0).alias("pi"),
        F.lit(None).cast("bigint").alias("ti"),
        F.lit(0.0).alias("md"),
        F.lit(0.0).alias("mnd"),
        F.lit(0.0).alias("pd"),
        F.lit(None).cast("bigint").alias("td"),
    )

    def step(acc, t):
        x = F.element_at(F.col("_xs"), t)
        td_ = t.cast("double")
        mean2 = acc["mean"] + (x - acc["mean"]) / td_
        mi2 = acc["mi"] + (x - mean2 - dl)
        mni2 = F.least(acc["mni"], mi2)
        ei = mi2 - mni2
        pi2 = F.greatest(acc["pi"], ei)
        ti2 = F.when(
            acc["ti"].isNull() & (ei > lm), t.cast("bigint")
        ).otherwise(acc["ti"])
        md2 = acc["md"] + (mean2 - x - dl)
        mnd2 = F.least(acc["mnd"], md2)
        ed = md2 - mnd2
        pd2 = F.greatest(acc["pd"], ed)
        td2 = F.when(
            acc["td"].isNull() & (ed > lm), t.cast("bigint")
        ).otherwise(acc["td"])
        return F.struct(
            mean2.alias("mean"),
            mi2.alias("mi"),
            mni2.alias("mni"),
            pi2.alias("pi"),
            ti2.alias("ti"),
            md2.alias("md"),
            mnd2.alias("mnd"),
            pd2.alias("pd"),
            td2.alias("td"),
        )

    acc = F.aggregate(F.sequence(F.lit(1), n), init, step)
    return staged.select(
        *by,
        n.alias("n"),
        acc["mean"].alias("mean"),
        acc["pi"].alias("ph_inc"),
        acc["ti"].alias("t_inc"),
        acc["ti"].isNotNull().alias("detect_inc"),
        acc["pd"].alias("ph_dec"),
        acc["td"].alias("t_dec"),
        acc["td"].isNotNull().alias("detect_dec"),
    )
