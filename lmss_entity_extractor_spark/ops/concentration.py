"""Concentration + serial-dependence statistics (L150/L151): the Gini
coefficient (how unevenly is value distributed over a key — revenue
concentration, token-ownership skew, the budget-planning twin of the
L94 key-skew diagnosis) and the sample autocorrelation function (is a
per-key series trending/cyclic — the pre-model question of every
time-series pipeline).  Both re-derived so every accumulated quantity
is EXACT decimal/integer arithmetic and the only IEEE operation is
one final division per output row — bit-identical, no grid.

L150 — Gini over DECIMAL(18,s) values x₁≤…≤xₙ (row_number ranks;
ties are safe because equal values contribute the same Σi·xᵢ under
any tie order):

    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)

Negative values are REFUSED (Gini is undefined there); zero total →
NULL.  One keyed window pass (row_number) + one combinable agg.

L151 — ACF at lags 1..L, mean-centred without ever dividing by n
until the end: with S = Σx and per-row centred value cₜ = n·xₜ − S
(exact decimal),

    r_h = Σ_{t>h} cₜ·cₜ₋ₕ / Σₜ cₜ²

— the n² factors cancel, so numerator and denominator are exact
decimal sums and r_h is one division.  Row order is pinned by an
explicit (order_cols...) tuple — the caller must make it a total
order (ties would make lag() nondeterministic).

Scale shape: Gini = one keyed exchange (window sort) + combinable
agg.  ACF = one combinable agg for (n, S), a broadcast join back,
one keyed window pass computing all L lags in a single sort, one
combinable agg — a 100 TB fact table is scanned twice, shuffled once
by key.  DECIMAL(38) bounds the exact range; ANSI mode fails loudly
on overflow rather than silently wrapping.

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_DEC = "decimal(38,6)"


def gini(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, total, gini)`` — Gini coefficient per group over
    non-negative values exactly representable at DECIMAL(18, scale).
    NULL values are ignored; negatives raise; zero total → NULL."""
    dec = f"decimal(18,{scale})"
    x = F.col(value_col).cast(dec)
    flt = df.filter(F.col(value_col).isNotNull()).select(*by, x.alias("_x"))
    if validation_enabled():
        n_neg = flt.filter(F.col("_x") < 0).count()
        if n_neg:
            raise ValueError(
                f"gini: {n_neg} negative value(s) in {value_col!r} — the "
                "Gini coefficient is undefined for negative values"
            )
    w = Window.partitionBy(*by).orderBy("_x")
    ranked = flt.withColumn("_i", F.row_number().over(w))
    agg = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("total"),
        # decimal(19,0) × decimal(18,s) = precision exactly 38: no
        # precision-cap scale adjustment, product stays exact
        F.sum(F.col("_i").cast("decimal(19,0)") * F.col("_x")).alias("_six"),
    )
    nd = F.col("n").cast(_DEC)
    sx = F.col("total").cast(_DEC)
    num = F.lit(2).cast(_DEC) * F.col("_six") - (nd + F.lit(1).cast(_DEC)) * sx
    den = nd * sx
    return agg.select(
        *by,
        "n",
        "total",
        F.when(
            den != F.lit(0).cast(_DEC), num.cast("double") / den.cast("double")
        ).alias("gini"),
    )


def acf(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    max_lag: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., lag, n, r)`` for lag = 1..max_lag — sample ACF per
    key, mean-centred via cₜ = n·xₜ − S so every sum is exact.  NULL
    values are refused (they would silently shift the lag lattice);
    series shorter than lag+1, or zero variance, yield NULL r."""
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"acf: {n_null} NULL value(s) in {value_col!r} — drop or "
                "impute first; silently skipping rows would shift lags"
            )
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by, *[c for c in order_cols if c not in by], F.col(value_col).cast(dec).alias("_x")
    )
    stats = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    joined = base.join(F.broadcast(stats), by)
    c = (
        F.col("_n").cast(_DEC) * F.col("_x").cast(_DEC)
        - F.col("_s").cast(_DEC)
    ).alias("_c")
    w = Window.partitionBy(*by).orderBy(*[F.col(c_) for c_ in order_cols])
    centred = joined.select(*by, "_n", *order_cols, c)
    lag_cols = [
        F.lag("_c", h).over(w).alias(f"_l{h}") for h in range(1, max_lag + 1)
    ]
    lagged = centred.select(*by, "_n", "_c", *lag_cols)
    aggs = [F.sum(F.col("_c") * F.col("_c")).alias("_den")] + [
        F.sum(F.col("_c") * F.col(f"_l{h}")).alias(f"_num{h}")
        for h in range(1, max_lag + 1)
    ]
    per_key = lagged.groupBy(*by, "_n").agg(*aggs)
    lags = F.explode(
        F.array(*[F.lit(h) for h in range(1, max_lag + 1)])
    ).alias("lag")
    long = per_key.select(*by, F.col("_n").alias("n"), "_den", lags, *[
        F.col(f"_num{h}") for h in range(1, max_lag + 1)
    ])
    num = F.coalesce(
        *[
            F.when(F.col("lag") == h, F.col(f"_num{h}"))
            for h in range(1, max_lag + 1)
        ]
    )
    ok = (
        F.col("_den").isNotNull()
        & (F.col("_den") != F.lit(0).cast(_DEC))
        & num.isNotNull()
    )
    return long.select(
        *by,
        "lag",
        "n",
        F.when(ok, num.cast("double") / F.col("_den").cast("double")).alias(
            "r"
        ),
    )


def ccf(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    x_col: str,
    y_col: str,
    max_lag: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., lag, n, r)`` for lag = 0..max_lag — sample cross-
    correlation of x with y lagged h steps behind (does x LEAD y);
    swap the columns for the other direction.  Same exact-centring
    trick as :func:`acf` (cₜ = n·xₜ − S, the n² cancels between
    numerator and the √(ΣcX²·ΣcY²) denominator — computed as
    sqrt·sqrt to stay in the decimal-exact range), one sqrt pair and
    one division per lag.  NULLs refused."""
    if validation_enabled():
        n_null = df.filter(
            F.col(x_col).isNull() | F.col(y_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"ccf: {n_null} NULL value(s) in {x_col!r}/{y_col!r} — drop "
                "or impute first; silently skipping rows would shift lags"
            )
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by,
        *order_cols,
        F.col(x_col).cast(dec).alias("_x"),
        F.col(y_col).cast(dec).alias("_y"),
    )
    stats = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
    )
    joined = base.join(F.broadcast(stats), by)
    cx = (
        F.col("_n").cast(_DEC) * F.col("_x").cast(_DEC) - F.col("_sx").cast(_DEC)
    ).alias("_cx")
    cy = (
        F.col("_n").cast(_DEC) * F.col("_y").cast(_DEC) - F.col("_sy").cast(_DEC)
    ).alias("_cy")
    w = Window.partitionBy(*by).orderBy(*[F.col(c) for c in order_cols])
    centred = joined.select(*by, "_n", *order_cols, cx, cy)
    lag_cols = [
        F.lag("_cy", h).over(w).alias(f"_l{h}") for h in range(0, max_lag + 1)
    ]
    lagged = centred.select(*by, "_n", "_cx", "_cy", *lag_cols)
    aggs = [
        F.sum(F.col("_cx") * F.col("_cx")).alias("_dx"),
        F.sum(F.col("_cy") * F.col("_cy")).alias("_dy"),
    ] + [
        F.sum(F.col("_cx") * F.col(f"_l{h}")).alias(f"_n{h}")
        for h in range(0, max_lag + 1)
    ]
    per_key = lagged.groupBy(*by, "_n").agg(*aggs)
    lags = F.explode(
        F.array(*[F.lit(h) for h in range(0, max_lag + 1)])
    ).alias("lag")
    long = per_key.select(
        *by,
        F.col("_n").alias("n"),
        "_dx",
        "_dy",
        lags,
        *[F.col(f"_n{h}") for h in range(0, max_lag + 1)],
    )
    num = F.coalesce(
        *[
            F.when(F.col("lag") == h, F.col(f"_n{h}"))
            for h in range(0, max_lag + 1)
        ]
    )
    den = F.sqrt(F.col("_dx").cast("double")) * F.sqrt(
        F.col("_dy").cast("double")
    )
    ok = (
        (F.col("_dx") > F.lit(0).cast(_DEC))
        & (F.col("_dy") > F.lit(0).cast(_DEC))
        & num.isNotNull()
    )
    return long.select(
        *by,
        "lag",
        "n",
        F.when(ok, num.cast("double") / den).alias("r"),
    )


def ljung_box(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    max_lag: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, m, q, dof)`` — the Ljung-Box portmanteau test
    (L228): is a series white noise, or is there autocorrelation at
    ANY lag up to m — the one-number closer over the per-lag ACF
    (L151), the standard residual-diagnostic companion to
    Durbin-Watson (L217, lag-1 only):

        Q = n(n+2) · Σ_{h=1..m} r_h² / (n − h),   dof = m

    Composed directly on :func:`acf` (same exact-decimal centring, one
    division per r_h), then ONE bounded lag-ordered fold — each term
    r_h²/(n−h) a fixed IEEE tree — and the final n(n+2)·Σ tree.
    Bit-identical given L151's bit-identity.  Any NULL r_h (series
    shorter than the lag, zero variance) → NULL q for that key, with
    n and m still reported.  Compare Q against the caller's χ²_m
    critical value.

    Scale shape: L151's shape plus one combinable fold — one keyed
    window sort, bounded m-length arrays.

    No reference counterpart; series-diagnostics analytics per SURVEY
    §2.11.
    """
    a = acf(df, by, order_cols, value_col, max_lag, scale)
    nd = F.col("n").cast("double")
    per = a.groupBy(*by, "n").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("r").isNull(), 1).otherwise(0)).alias("_bad"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("lag"), F.col("r")))
            ),
            F.lit(0.0),
            lambda acc, v: acc
            + (v["r"] * v["r"]) / (nd - v["lag"].cast("double")),
        ).alias("_s"),
    )
    q = nd * (nd + F.lit(2.0)) * F.col("_s")
    return per.select(
        *by,
        "n",
        "m",
        F.when(F.col("_bad") == 0, q).alias("q"),
        F.col("m").alias("dof"),
    )


def diversity_indices(
    df: DataFrame,
    by: list[str],
    value_col: str,
) -> DataFrame:
    """``(by..., n, k, shannon, evenness, simpson, inv_simpson,
    berger_parker)`` — the categorical diversity panel (L257): how
    concentrated is a composition (event mix, vocabulary, label
    balance) — the CATEGORICAL companion to the rank-based Gini
    (L150):

        H  = −Σ p·ln p          (Shannon, nats)
        J  = H / ln k           (Pielou evenness; NULL at k = 1)
        D  = Σ p²               (Simpson),  1/D (inverse Simpson)
        BP = max p              (Berger-Parker dominance)

    Counts are exact integers; each p = c/n term is a fixed IEEE tree
    folded over the BOUNDED sorted category list (the L140/L152
    discipline — ln is the family's libm reliance); BP's max is
    order-insensitive.  Empty groups can't occur (cells require a
    row); k = 1 → H = 0, J NULL, D = 1.

    Scale shape: one combinable (keys, value) groupBy + one bounded
    fold — one scan of 100 TB.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(value_col).isNotNull())
    cells = flt.groupBy(*by, F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = cells.groupBy(*by).agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.max("_c").alias("_cmax"),
        F.sort_array(
            F.collect_list(F.struct("_v", "_c"))
        ).alias("_lv"),
    )
    nd = F.col("n").cast("double")
    h = -F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_c"].cast("double") / nd)
        * F.log(v["_c"].cast("double") / nd),
    )
    d = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_c"].cast("double") / nd)
        * (v["_c"].cast("double") / nd),
    )
    kd = F.col("k").cast("double")
    return agg.select(
        *by,
        "n",
        "k",
        h.alias("shannon"),
        F.when(F.col("k") > 1, h / F.log(kd)).alias("evenness"),
        d.alias("simpson"),
        F.when(d > 0.0, F.lit(1.0) / d).alias("inv_simpson"),
        (F.col("_cmax").cast("double") / nd).alias("berger_parker"),
    )


def dispersion_index(
    df: DataFrame,
    by: list[str],
    count_col: str,
) -> DataFrame:
    """``(by..., n, mean, var, vmr)`` — the variance-to-mean ratio /
    index of dispersion (L262) over a COUNT column: 1 = Poisson,
    > 1 overdispersed (bursty terms, hot keys), < 1 underdispersed
    (regular) — the corpus-curation dispersion screen (a term whose
    per-document counts are overdispersed is topical; VMR ≈ 1 is
    function-word-like) and the key-skew diagnostic's statistical
    twin (L94 ranks keys; VMR scores the whole distribution).

    Counts must be non-negative integers (validated loudly); the
    caller decides the unit universe (zero-count units must be
    materialized upstream if they belong in the denominator —
    documented).  Exact decimal sufficient statistics, sample
    variance, fixed trees; n < 2 or zero mean → NULL vmr.

    Scale shape: one combinable agg — one scan.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(count_col).isNotNull())
    if validation_enabled():
        n_neg = flt.filter(F.col(count_col) < 0).count()
        if n_neg:
            raise ValueError(
                f"dispersion_index: {n_neg} negative count(s)"
            )
    xd = F.col(count_col).cast("decimal(20,0)")
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_q"),
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    mean = sd_ / nd
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    ok = (F.col("n") >= 2) & (mean > 0.0)
    return agg.select(
        *by,
        "n",
        mean.alias("mean"),
        F.when(F.col("n") >= 2, var).alias("var"),
        F.when(ok, var / mean).alias("vmr"),
    )


def hoover_index(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, total, hoover)`` — the Hoover/Pietra index (L265): the share of total mass that would have to MOVE to
    equalize the distribution — the operational twin of Gini (L150
    scores inequality; Hoover says how much rebalancing fixes it,
    which is exactly the shuffle-rebalance question for skewed keys):

        H = Σᵢ |n·xᵢ − S| / (2·n·S)

    The cross-multiplied form (the L151/L181 trick) keeps every
    numerator term an exact decimal — the sum is order-insensitive
    (decimal), and H is ONE division — bit-identical, no folds, no
    windows, one combinable aggregation pass after the broadcast of
    (n, S).  Negative values refused (mass must be non-negative);
    S = 0 → NULL.

    Scale shape: one stats agg + one broadcast join back + one
    combinable agg — two scans, both full-parallel.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    wide = f"decimal(38,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    if validation_enabled():
        n_neg = flt.filter(F.col(value_col) < 0).count()
        if n_neg:
            raise ValueError(f"hoover_index: {n_neg} negative value(s)")
    base = flt.select(*by, F.col(value_col).cast(dec).alias("_x"))
    stats = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"), F.sum("_x").alias("_s")
    )
    joined = (
        base.join(F.broadcast(stats), by)
        if by
        else base.crossJoin(F.broadcast(stats))
    )
    dev = F.abs(
        F.col("n").cast(wide) * F.col("_x").cast(wide)
        - F.col("_s").cast(wide)
    )
    agg = joined.groupBy(*by, "n", "_s").agg(
        F.sum(dev).alias("_d")
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    h = F.col("_d").cast("double") / (F.lit(2.0) * nd * sd_)
    return agg.select(
        *by,
        "n",
        sd_.alias("total"),
        F.when(F.col("_s") > 0, h).alias("hoover"),
    )


def inequality_indices(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, k, mean, theil_t, theil_l, atkinson)`` — the
    entropy-based inequality panel (L267), completing the inequality
    family (Gini L150 = rank-based, Hoover L265 = rebalance share;
    these are the DECOMPOSABLE members — sub-group Theils add up,
    which is what a per-partition/per-tenant cost breakdown needs):

        T_T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ)      (Theil T, top-sensitive)
        T_L = (1/n)·Σ ln(μ/xᵢ)             (Theil L / MLD,
                                            bottom-sensitive)
        A₁  = 1 − geomean(x)/μ             (Atkinson ε=1)

    Values are cast to DECIMAL(18,scale) and cell-compressed
    (distinct value × exact count — the grid is bounded by the
    value range × 10^scale), so n and S = Σx are exact and each ln
    term is a fixed IEEE tree folded over the BOUNDED sorted cell
    list (the L257 discipline).  Strictly positive values REQUIRED —
    ln is undefined at 0, so nonpositive values are refused loudly.

    Scale shape: one combinable (keys, value) groupBy + one bounded
    fold — one scan of 100 TB.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    if validation_enabled():
        n_bad = flt.filter(F.col(value_col) <= 0).count()
        if n_bad:
            raise ValueError(
                f"inequality_indices: {n_bad} nonpositive value(s)"
            )
    cells = flt.groupBy(
        *by, F.col(value_col).cast(dec).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = cells.groupBy(*by).agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("_v") * F.col("_c")).alias("_s"),
        F.sort_array(F.collect_list(F.struct("_v", "_c"))).alias("_lv"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("_s").cast("double") / nd

    def _fold(term):
        return F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda acc, v: acc
            + v["_c"].cast("double") * term(v["_v"].cast("double")),
        )

    t_t = _fold(lambda vd: (vd / mu) * F.log(vd / mu)) / nd
    t_l = _fold(lambda vd: F.log(mu / vd)) / nd
    lng = _fold(F.log) / nd
    return agg.select(
        *by,
        "n",
        "k",
        mu.alias("mean"),
        t_t.alias("theil_t"),
        t_l.alias("theil_l"),
        (F.lit(1.0) - F.exp(lng) / mu).alias("atkinson"),
    )


def lorenz_points(
    df: DataFrame,
    by: list[str],
    value_col: str,
    n_points: int = 10,
    scale: int = 2,
) -> DataFrame:
    """``(by..., point, pop_share, cum_share)`` — Lorenz curve
    sampled at k evenly spaced population quantiles (L296): the
    PLOTTABLE companion to the inequality scalars (Gini L150 = twice
    the area above it, Hoover L265 = its max vertical gap, Theil
    L267): point i covers the poorest ⌊i·n/k⌋ rows,
    pop_share = ⌊i·n/k⌋/n, cum_share = their exact value share.

    One keyed window pass (ascending value sort with a running
    DECIMAL cumsum), then an equi-join against the k exact cut
    positions — every share is one IEEE division of exact decimals.
    Ties are safe: equal values contribute equally under any tie
    order, and the cut is by ROW position of the sorted multiset
    (documented: the curve of the multiset, not of distinct values).
    Negative values REFUSED (Lorenz is undefined); zero total → NULL
    shares.  Points whose cut position is 0 (n < k) are omitted.

    Scale shape: one keyed window sort + one broadcast join on the
    bounded point set — the L150 Gini shape with a k-row join bolted
    on.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    if n_points < 1:
        raise ValueError("lorenz_points: n_points must be >= 1")
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    if validation_enabled():
        n_neg = flt.filter(F.col(value_col) < 0).count()
        if n_neg:
            raise ValueError(f"lorenz_points: {n_neg} negative value(s)")
    base = flt.select(*by, F.col(value_col).cast(dec).alias("_x"))
    w = Window.partitionBy(*by).orderBy("_x")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        *by,
        F.row_number().over(w).alias("_rn"),
        F.sum("_x").over(wp).alias("_cum"),
        F.count(F.lit(1)).over(wa).alias("_n"),
        F.sum("_x").over(wa).alias("_tot"),
    )
    pts = ranked.select(
        *by,
        "_rn",
        "_cum",
        "_n",
        "_tot",
        F.explode(
            F.array(*[F.lit(i) for i in range(1, n_points + 1)])
        ).alias("point"),
    ).filter(
        F.col("_rn")
        == F.floor(
            F.col("point") * F.col("_n") / F.lit(n_points)
        )
    )
    ok = F.col("_tot") > 0
    return pts.select(
        *by,
        "point",
        (F.col("_rn").cast("double") / F.col("_n").cast("double")).alias(
            "pop_share"
        ),
        F.when(
            ok,
            F.col("_cum").cast("double") / F.col("_tot").cast("double"),
        ).alias("cum_share"),
    )


def gini_jackknife(
    df: DataFrame,
    by: list[str],
    value_col: str,
    max_len: int = 10_000,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, gini, se_jack)`` — the Gini coefficient (L150)
    with a DETERMINISTIC jackknife standard error (L304): the
    resampling-free answer to "is this quarter's concentration move
    real or noise" — no RNG, no bootstrap draws, bit-identical:

        leave-one-out identity (NO refits): removing the k-th sorted
        value shifts every higher rank down by one, so
        T₍₋k₎ = T − k·xₖ − (S − Pₖ)   (T = Σi·xᵢ, Pₖ = prefix sum)
        and G₍₋k₎ is one fixed tree per row;
        se = sqrt((n−1)/n · Σ(G₍₋k₎ − Ḡ)²)

    — tie-order INVARIANT (removing either of two equal values gives
    algebraically the same G₍₋k₎).  Prefix sums are exact decimals
    from one keyed window pass; the LOO values are collected into the
    bounded sorted list (``max_len`` refused beyond — jackknifing a
    10⁶-row group is statistical overkill; sample first) and the SE
    folds are order-pinned.  Negative values refused (L150's
    contract); zero totals or n < 2 → NULL.

    Scale shape: one keyed window pass + one bounded collect + two
    folds.

    No reference counterpart; composition analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    d38 = f"decimal(38,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    if validation_enabled():
        n_neg = flt.filter(F.col(value_col) < 0).count()
        if n_neg:
            raise ValueError(f"gini_jackknife: {n_neg} negative value(s)")
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"gini_jackknife: a group exceeds max_len={max_len}"
            )
    base = flt.select(*by, F.col(value_col).cast(dec).alias("_x"))
    w = Window.partitionBy(*by).orderBy("_x")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kc = F.row_number().over(w)
    ranked = base.select(
        *by,
        kc.alias("_k"),
        F.col("_x").cast(d38).alias("_xk"),
        F.sum("_x").over(wp).cast(d38).alias("_pk"),
        F.count(F.lit(1)).over(wa).alias("_n"),
        F.sum("_x").over(wa).cast(d38).alias("_s"),
        F.sum(kc.cast(d38) * F.col("_x").cast(d38))
        .over(wa)
        .alias("_t"),
    )
    n1 = (F.col("_n") - 1).cast("double")
    s1 = (F.col("_s") - F.col("_xk")).cast("double")
    t1 = (
        F.col("_t")
        - F.col("_k").cast(d38) * F.col("_xk")
        - (F.col("_s") - F.col("_pk"))
    ).cast("double")
    g_k = F.when(
        (F.col("_n") >= 2) & (s1 > 0.0),
        (F.lit(2.0) * t1 - (n1 + F.lit(1.0)) * s1) / (n1 * s1),
    )
    loo = ranked.select(*by, "_k", "_n", "_s", "_t", g_k.alias("_g"))
    packed = loo.groupBy(*by, "_n", "_s", "_t").agg(
        F.sort_array(F.collect_list(F.struct("_k", "_g"))).alias(
            "_lv"
        )
    )
    nd = F.col("_n").cast("double")
    gbar = (
        F.aggregate(
            F.col("_lv"), F.lit(0.0), lambda a, e: a + e["_g"]
        )
        / nd
    )
    s2 = packed.select(
        *by, "_n", "_s", "_t", "_lv", gbar.alias("_gbar")
    )
    ssq = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (e["_g"] - F.col("_gbar")) * (e["_g"] - F.col("_gbar")),
    )
    sd_ = F.col("_s").cast("double")
    td_ = F.col("_t").cast("double")
    gini_full = (
        F.lit(2.0) * td_ - (nd + F.lit(1.0)) * sd_
    ) / (nd * sd_)
    ok = (F.col("_n") >= 2) & (sd_ > 0.0)
    return s2.select(
        *by,
        F.col("_n").alias("n"),
        F.when(ok, gini_full).alias("gini"),
        F.when(
            ok,
            F.sqrt((nd - F.lit(1.0)) / nd * ssq),
        ).alias("se_jack"),
    )


def abc_classification(
    df: DataFrame,
    by: list[str],
    item_cols: list[str],
    value_col: str,
    a_share: str = "0.80",
    b_share: str = "0.95",
    scale: int = 2,
) -> DataFrame:
    """ABC / Pareto classification (L387): ``(by..., item_cols...,
    value, rank, cum_value, cum_share, abc_class)`` — rank items by
    value within each group and classify them A/B/C by cumulative
    value share (inventory analysis, revenue concentration — the
    actionable per-item companion to the scalar Gini L150).

    Convention (pinned): items sort by (value DESC, item_cols ASC) —
    a total order whenever item_cols are distinct per group (equal
    full rows may swap ranks, but then the output multiset is
    unchanged).  An item's class is decided by the cumulative share
    STRICTLY BEFORE it (prev = cum − value):

        prev < a_share·total  → A     (the first item is always A)
        prev < b_share·total  → B
        else                  → C

    so the item that CROSSES a boundary still belongs to the richer
    class.  The boundary comparison runs ENTIRELY in decimal —
    thresholds are decimal STRINGS multiplied exactly into the total
    (the L173 discipline), so class membership cannot knife-edge on
    an IEEE cumulative share across engines.  ``cum_share`` is the
    one IEEE division per row.  Negative values are REFUSED (shares
    would be non-monotone); zero total → NULL share and class.

    Scale shape: one keyed exchange (window sort on the group), a
    window cumulative sum riding the same sort, one tiny grouped
    total joined back via the window's partition — a 100 TB fact
    table is shuffled once by group.

    No reference counterpart; analytics per SURVEY §2.11."""
    from decimal import Decimal

    ta, tb = Decimal(a_share), Decimal(b_share)
    if not (Decimal(0) < ta <= tb < Decimal(1)):
        raise ValueError(
            f"abc_classification: need 0 < a_share <= b_share < 1, "
            f"got {a_share!r}, {b_share!r}"
        )
    dec = f"decimal(18,{scale})"
    x = F.col(value_col).cast(dec)
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, *item_cols, x.alias("_x")
    )
    if validation_enabled():
        n_neg = flt.filter(F.col("_x") < 0).count()
        if n_neg:
            raise ValueError(
                f"abc_classification: {n_neg} negative value(s) in "
                f"{value_col!r} — cumulative share would be non-monotone"
            )
    order = [F.col("_x").desc()] + [F.col(c).asc() for c in item_cols]
    w = Window.partitionBy(*by).orderBy(*order)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy(*by)
    cum = F.sum("_x").over(wc)
    total = F.sum("_x").over(wt)
    prev = cum - F.col("_x")
    # decimal(5,4) × decimal(28,s): exact product, exact compare
    lim_a = F.lit(str(ta)).cast("decimal(5,4)") * total
    lim_b = F.lit(str(tb)).cast("decimal(5,4)") * total
    return flt.select(
        *by,
        *item_cols,
        F.col("_x").alias("value"),
        F.row_number().over(w).alias("rank"),
        cum.alias("cum_value"),
        F.when(
            total != F.lit(0).cast(dec),
            cum.cast("double") / total.cast("double"),
        ).alias("cum_share"),
        F.when(total == F.lit(0).cast(dec), F.lit(None).cast("string"))
        .when(prev < lim_a, F.lit("A"))
        .when(prev < lim_b, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def newey_west(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    max_lag: int,
    scale: int = 2,
) -> DataFrame:
    """Newey-West HAC mean inference (L393): ``(by..., n, mean,
    var_iid, se_iid, lrv, se_hac)`` — the autocorrelation-robust
    standard error of a per-key mean (Newey & West 1987, Bartlett
    kernel).  The iid se of a telemetry/financial mean is a LIE under
    serial dependence; the long-run variance repairs it:

        LRV = γ₀ + 2·Σ_{h=1..L} (1 − h/(L+1))·γ_h
        se_hac = √(LRV/n)        vs        se_iid = √(s²/n)

    Rides the L151 exact machinery VERBATIM: centred values
    cₜ = n·xₜ − S (exact decimal), so γ_h = G_h/n³ with
    G_h = Σ cₜcₜ₋ₕ an exact decimal sum — every lag from ONE keyed
    window sort, LRV as one fixed IEEE tree with the Bartlett weights
    as pinned literals folded in ascending-h order.  NULL values are
    REFUSED (they would shift the lag lattice — the L151 rule);
    n < max_lag+2 → NULL lrv/se_hac (the kernel needs every lag
    populated twice); n < 2 → NULL var_iid/se_iid.  A negative LRV
    estimate (possible for finite samples despite Bartlett's psd
    guarantee being asymptotic in tandem with truncation) is clamped
    via √max(0, ·) with the clamp documented — se 0, not NaN.

    Scale shape: identical to L151 — one combinable (n, S) agg, one
    broadcast join back, ONE keyed window computing all L lags in a
    single sort, one combinable agg.

    No reference counterpart; analytics per SURVEY §2.11 (completes
    L151 ACF → L353 AR(1) → L393 robust-inference chain)."""
    if max_lag < 1:
        raise ValueError("newey_west: max_lag must be >= 1")
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"newey_west: {n_null} NULL value(s) in {value_col!r} — "
                "drop or impute first; silently skipping rows would "
                "shift lags"
            )
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by,
        *[c for c in order_cols if c not in by],
        F.col(value_col).cast(dec).alias("_x"),
    )
    stats = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_s")
    )
    joined = base.join(F.broadcast(stats), by)
    c = (
        F.col("_n").cast(_DEC) * F.col("_x").cast(_DEC)
        - F.col("_s").cast(_DEC)
    ).alias("_c")
    w = Window.partitionBy(*by).orderBy(*[F.col(c_) for c_ in order_cols])
    centred = joined.select(*by, "_n", "_s", *order_cols, c)
    lag_cols = [
        F.lag("_c", h).over(w).alias(f"_l{h}")
        for h in range(1, max_lag + 1)
    ]
    lagged = centred.select(*by, "_n", "_s", "_c", *lag_cols)
    aggs = [F.sum(F.col("_c") * F.col("_c")).alias("_g0")] + [
        F.sum(F.col("_c") * F.col(f"_l{h}")).alias(f"_g{h}")
        for h in range(1, max_lag + 1)
    ]
    per_key = lagged.groupBy(*by, "_n", "_s").agg(*aggs)
    nd = F.col("_n").cast("double")
    g0 = F.col("_g0").cast("double")
    bart = None
    for h in range(1, max_lag + 1):
        term = F.lit(1.0 - h / (max_lag + 1.0)) * F.col(f"_g{h}").cast(
            "double"
        )
        bart = term if bart is None else bart + term
    lrv = (g0 + F.lit(2.0) * bart) / (nd * nd * nd)
    var_iid = g0 / (nd * nd * (nd - F.lit(1.0)))
    ok_hac = F.col("_n") >= max_lag + 2
    ok_iid = F.col("_n") >= 2
    return per_key.select(
        *by,
        F.col("_n").alias("n"),
        (F.col("_s").cast("double") / nd).alias("mean"),
        F.when(ok_iid, var_iid).alias("var_iid"),
        F.when(ok_iid, F.sqrt(var_iid / nd)).alias("se_iid"),
        F.when(ok_hac, lrv).alias("lrv"),
        F.when(
            ok_hac, F.sqrt(F.greatest(F.lit(0.0), lrv) / nd)
        ).alias("se_hac"),
    )


def count_model_panel(
    df: DataFrame,
    by: list[str],
    count_col: str,
) -> DataFrame:
    """Count-model diagnostics (L414): ``(by..., n, mean, var, nb_r,
    nb_p, p0_obs, p0_poisson, zi_chi2)`` — the MODEL layer over the
    L262 dispersion screen: once VMR says "overdispersed", which law
    fits?  Negative-binomial method-of-moments

        r = m²/(s² − m),   p = m/s²        (defined only when
                                            s² > m, else NULL —
                                            equi/underdispersed)

    with sample variance s² (n−1, pinned) from exact integer sums
    (n·Σx² − (Σx)² over DECIMAL(38,0)), and the van-den-Broek score
    test for ZERO inflation against Poisson(m):

        zi_chi2 = (n₀ − n·e^{−m})² / (n·e^{−m}(1 − e^{−m}) − n·m·e^{−2m})

    — exact integer zero counts, the two e^{−m} calls the only
    transcendentals (single final terms, the L50 caveat); a
    non-positive test denominator → NULL (degenerate design).
    Negative counts REFUSED; NULLs ignored; n < 2 → NULL var and
    everything downstream.

    Scale shape: ONE combinable groupBy — counts, sums, squares,
    zeros in a single pass.

    No reference counterpart; analytics per SURVEY §2.11 (composes
    with L262 dispersion_index and L360 Poisson rate CIs)."""
    flt = df.filter(F.col(count_col).isNotNull()).select(
        *by, F.col(count_col).cast("long").alias("_x")
    )
    if validation_enabled():
        n_neg = flt.filter(F.col("_x") < 0).count()
        if n_neg:
            raise ValueError(
                f"count_model_panel: {n_neg} negative count(s)"
            )
    dec = "decimal(38,0)"
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(dec)).alias("_s"),
        F.sum(
            F.col("_x").cast("decimal(19,0)")
            * F.col("_x").cast("decimal(19,0)")
        ).alias("_ss"),
        F.sum(F.when(F.col("_x") == 0, 1).otherwise(0)).alias("_n0"),
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    ssd = F.col("_ss").cast("double")
    m = sd_ / nd
    var = (nd * ssd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    over = var > m
    em = F.exp(-m)
    n0d = F.col("_n0").cast("double")
    zi_num = (n0d - nd * em) * (n0d - nd * em)
    zi_den = nd * em * (F.lit(1.0) - em) - nd * m * em * em
    ok2 = F.col("n") >= 2
    return agg.select(
        *by,
        "n",
        m.alias("mean"),
        F.when(ok2, var).alias("var"),
        F.when(ok2 & over, (m * m) / (var - m)).alias("nb_r"),
        F.when(ok2 & over, m / var).alias("nb_p"),
        (n0d / nd).alias("p0_obs"),
        em.alias("p0_poisson"),
        F.when(ok2 & (zi_den > 0), zi_num / zi_den).alias("zi_chi2"),
    )
