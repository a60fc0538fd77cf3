"""Robust trend detection (L161/L162): the Mann-Kendall test (is this
series monotonically trending — the nonparametric workhorse of metric
monitoring) and the Theil-Sen estimator (the robust slope that one
outlier can't move) — both defined over ALL pairs of observations, so
they are computed over an explicit bounded pair lattice.

Boundedness contract (the L159 discipline): per-key series length is
capped (``max_len``, REFUSED loudly beyond) because both statistics
are pairwise by definition — n² pairs at n=10³ is 10⁶ rows per key,
fine; unbounded would be quadratic in the fact table.  Long series
should be bucketed/resampled first (L112); the statistics stabilize
long before 10³ points.

L161 — Mann-Kendall: S = Σ_{i<j} sgn(x_j − x_i) over time order —
an EXACT integer; the tie-corrected variance

    Var = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18

is exact integer arithmetic over value-tie groups, and
Z = (S∓1)/√Var (continuity-corrected, 0 at S=0) is a fixed IEEE
tree — bit-identical, ungridded.

L162 — Theil-Sen: median of the (y_j−y_i)/(t_j−t_i) pairwise slopes
(distinct t only).  Each slope is ONE IEEE division; the median is an
exact order statistic over the sorted slope list (even counts average
the two middle values — one add + one halving).

Scale shape: per-key collect_list (bounded by contract) → posexplode
pair lattice inside the row (no shuffle beyond the key groupBy) →
combinable aggregation.  100 TB of series tables = one keyed exchange.

No reference counterpart; monitoring/trend analytics per SURVEY §2.11
(composes with L93 EWMA, L151 ACF, L154 CUSUM as the series-health
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_MAX_LEN_DEFAULT = 1000


def _packed(df, by, order_col, value_col, max_len):
    flt = df.filter(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
    base = flt.select(
        *by,
        F.col(order_col).cast("double").alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    )
    sizes = base.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"trend: at least one series exceeds max_len={max_len} — "
                "resample/bucket first (the statistics are pairwise; an "
                "unbounded series is quadratic by definition)"
            )
    arr = F.sort_array(F.collect_list(F.struct("_t", "_x"))).alias("_a")
    return base.groupBy(*by).agg(arr)


def _pairs(packed, by):
    """One row per (i < j) pair of the sorted series."""
    e1 = packed.select(*by, "_a", F.posexplode("_a").alias("_i", "_p"))
    e2 = e1.select(*by, "_i", "_p", F.posexplode("_a").alias("_j", "_q"))
    return e2.filter(F.col("_i") < F.col("_j"))


def mann_kendall(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    max_len: int = _MAX_LEN_DEFAULT,
) -> DataFrame:
    """``(by..., n, s, var_s, z)`` — Mann-Kendall trend per key.  S and
    Var are exact; Z uses the standard continuity correction (NULL when
    Var = 0 — all values tied or n < 2)."""
    packed = _packed(df, by, order_col, value_col, max_len)
    sgn = F.signum(F.col("_q._x") - F.col("_p._x")).cast("long")
    s_tbl = _pairs(packed, by).groupBy(*by).agg(
        F.sum(sgn).alias("s"),
    )
    # tie groups over values; n from the packed array
    base = packed.select(*by, F.size("_a").alias("n"), F.explode("_a").alias("_e"))
    ties = (
        base.groupBy(*by, "n", F.col("_e._x").alias("_v"))
        .agg(F.count(F.lit(1)).alias("_tc"))
        .groupBy(*by, "n")
        .agg(
            F.sum(
                F.col("_tc")
                * (F.col("_tc") - 1)
                * (F.lit(2) * F.col("_tc") + 5)
            ).alias("_tie_term")
        )
    )
    j = s_tbl.join(ties, by)
    nn = F.col("n").cast("long")
    var18 = nn * (nn - 1) * (F.lit(2) * nn + 5) - F.col("_tie_term")
    var_s = var18.cast("double") / F.lit(18.0)
    z = F.when(
        F.col("s") > 0, (F.col("s") - F.lit(1)).cast("double") / F.sqrt(var_s)
    ).when(
        F.col("s") < 0, (F.col("s") + F.lit(1)).cast("double") / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return j.select(
        *by,
        "n",
        "s",
        var_s.alias("var_s"),
        F.when(var18 > 0, z).alias("z"),
    )


def theil_sen(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    max_len: int = _MAX_LEN_DEFAULT,
) -> DataFrame:
    """``(by..., n_slopes, slope)`` — median pairwise slope per key
    (pairs with equal t excluded).  NULL when no valid pair exists."""
    packed = _packed(df, by, order_col, value_col, max_len)
    pairs = _pairs(packed, by).filter(F.col("_q._t") != F.col("_p._t"))
    slope = (F.col("_q._x") - F.col("_p._x")) / (
        F.col("_q._t") - F.col("_p._t")
    )
    slopes = pairs.groupBy(*by).agg(
        F.sort_array(F.collect_list(slope)).alias("_s")
    )
    k = F.size("_s")
    # explicit floor: DuckDB's double->int CAST rounds half-up while
    # Spark's truncates — an 827.5 index must be 827 on both engines
    mid_hi = F.element_at("_s", (F.floor(k / 2) + 1).cast("int"))
    mid_lo = F.element_at("_s", F.floor((k + 1) / 2).cast("int"))
    median = F.when(k % 2 == 1, mid_hi).otherwise(
        (mid_lo + mid_hi) / F.lit(2.0)
    )
    return slopes.select(
        *by,
        k.alias("n_slopes"),
        F.when(k > 0, median).alias("slope"),
    )


def hodges_lehmann(
    df: DataFrame,
    by: list[str],
    value_col: str,
    max_len: int = _MAX_LEN_DEFAULT,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, n_pairs, hl)`` — the one-sample Hodges-Lehmann
    location estimator (L225): the median of all Walsh averages
    (x_i + x_j)/2 over i ≤ j — the robust "typical value" whose
    breakdown point (~29%) beats the mean's 0% without the median's
    efficiency loss; it is also the point estimate dual to the
    Wilcoxon signed-rank test (L189).

    Exactness: values are cast to DECIMAL(18, scale), so every DOUBLED
    Walsh sum x_i + x_j is an exact decimal; the median is an exact
    order statistic over the sorted sum list (the L162 floored-index
    discipline), and the final halving (/2 odd, /4 for the even-count
    average) happens in DOUBLE where division by a power of two is
    exactly rounded — bit-identical, ungridded.

    Boundedness contract (the L161/L162 discipline): n(n+1)/2 pairs
    per key, so series beyond ``max_len`` are REFUSED loudly —
    bucket/resample first; the estimator stabilizes long before 10³
    points.

    Scale shape: one keyed collect (bounded by contract) → in-row pair
    lattice → combinable median agg.  100 TB = one keyed exchange.

    No reference counterpart; robust-statistics analytics per SURVEY
    §2.11 (composes with L137 MAD, L162 Theil-Sen, L204 trimmed
    means).
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    base = flt.select(*by, F.col(value_col).cast(dec).alias("_x"))
    sizes = base.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"hodges_lehmann: at least one series exceeds max_len="
                f"{max_len} — resample/bucket first (the estimator is "
                "pairwise; an unbounded series is quadratic by definition)"
            )
    packed = base.groupBy(*by).agg(
        F.sort_array(F.collect_list("_x")).alias("_a"),
        F.count(F.lit(1)).alias("n"),
    )
    e1 = packed.select(*by, "n", "_a", F.posexplode("_a").alias("_i", "_p"))
    e2 = e1.select(
        *by, "n", "_i", "_p", F.posexplode("_a").alias("_j", "_q")
    ).filter(F.col("_i") <= F.col("_j"))
    sums = e2.groupBy(*by, "n").agg(
        F.sort_array(
            F.collect_list(F.col("_p") + F.col("_q"))
        ).alias("_s")
    )
    k = F.size("_s")
    mid_hi = F.element_at("_s", (F.floor(k / 2) + 1).cast("int"))
    mid_lo = F.element_at("_s", F.floor((k + 1) / 2).cast("int"))
    hl = F.when(k % 2 == 1, mid_hi.cast("double") / F.lit(2.0)).otherwise(
        (mid_lo + mid_hi).cast("double") / F.lit(4.0)
    )
    return sums.select(
        *by,
        "n",
        k.cast("long").alias("n_pairs"),
        F.when(k > 0, hl).alias("hl"),
    )


def cox_stuart(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``(by..., n, n_pairs, plus, minus, z)`` — the Cox-Stuart trend
    test (L276): the assumption-free sign test for monotone trend —
    pair each point in the FIRST half of the series with its opposite
    number half a series later and count rises vs falls (Cox & Stuart
    1955); the O(n) companion to Mann-Kendall (L180, O(n²) pairs):

        m = ⌊n/2⌋, pairs (xᵢ, xᵢ₊⌈n/2⌉) for i ≤ m (odd n drops the
        middle point);  ties dropped;  N = plus + minus
        z = (plus − N/2) / sqrt(N/4)

    Positions come from one row_number window; the half-offset join
    is an exact integer equi-join (i + m = j) — no data-dependent
    ``lag`` offset needed.  All counts exact; z is one fixed tree;
    N = 0 → NULL z.  NULL values refused (they shift positions).

    Scale shape: one keyed window sort + one self equi-join on
    (keys, position) + one combinable agg — two shuffles on the
    series key, nothing quadratic.

    No reference counterpart; trend analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"cox_stuart: {n_null} NULL value(s) — impute first"
            )
    w = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    idx = df.select(
        *by,
        F.row_number().over(w).alias("_i"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy(*by).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_n"),
        F.col(value_col).alias("_x"),
    )
    m = F.floor(F.col("_n") / 2)
    first = idx.filter(F.col("_i") <= m).select(
        *by,
        "_n",
        (F.col("_i") + (F.col("_n") - m)).alias("_j"),
        F.col("_x").alias("_x1"),
    )
    second = idx.select(
        *by, F.col("_i").alias("_j"), F.col("_x").alias("_x2")
    )
    pairs = first.join(second, [*by, "_j"])
    agg = pairs.groupBy(*by, "_n").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("_x2") > F.col("_x1"), 1).otherwise(0)
        ).alias("plus"),
        F.sum(
            F.when(F.col("_x2") < F.col("_x1"), 1).otherwise(0)
        ).alias("minus"),
    )
    nn = (F.col("plus") + F.col("minus")).cast("double")
    z = (F.col("plus").cast("double") - nn / F.lit(2.0)) / F.sqrt(
        nn / F.lit(4.0)
    )
    return agg.select(
        *by,
        F.col("_n").alias("n"),
        "n_pairs",
        "plus",
        "minus",
        F.when(F.col("plus") + F.col("minus") > 0, z).alias("z"),
    )


def turning_points(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``(by..., n, t_points, expected, z)`` — the turning-points
    test (L279): count strict local maxima + minima and compare to
    the randomness expectation — the cheapest series-randomness
    screen (one window pass; Bartels L278 and runs L219 are its
    sharper siblings):

        E[T] = 2(n−2)/3,   Var[T] = (16n − 29)/90
        z = (T − E) / sqrt(Var)

    T is an exact integer (one lag + one lead per row); E and Var are
    fixed rational trees.  ADJACENT TIES are REFUSED loudly — the
    null moments assume a continuous series, and silently skipping
    tied neighbours would bias T.  NULL values refused; n < 3 → NULL.

    Scale shape: one keyed window sort + one combinable agg.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"turning_points: {n_null} NULL value(s) — impute first"
            )
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    lagged = df.select(
        *by,
        F.col(value_col).alias("_x"),
        F.lag(value_col, 1).over(wt).alias("_pr"),
        F.lead(value_col, 1).over(wt).alias("_nx"),
    )
    if validation_enabled():
        n_tied = lagged.filter(
            F.col("_nx").isNotNull() & (F.col("_x") == F.col("_nx"))
        ).count()
        if n_tied:
            raise ValueError(
                f"turning_points: {n_tied} adjacent tie(s) — the null "
                "moments assume a continuous series; jitter or aggregate "
                "first"
            )
    is_turn = (
        F.col("_pr").isNotNull()
        & F.col("_nx").isNotNull()
        & (
            ((F.col("_x") > F.col("_pr")) & (F.col("_x") > F.col("_nx")))
            | ((F.col("_x") < F.col("_pr")) & (F.col("_x") < F.col("_nx")))
        )
    )
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_turn.cast("long")).alias("t_points"),
    )
    nd = F.col("n").cast("double")
    e = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    var = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    ok = F.col("n") >= 3
    return agg.select(
        *by,
        "n",
        "t_points",
        F.when(ok, e).alias("expected"),
        F.when(
            ok & (var > 0.0),
            (F.col("t_points").cast("double") - e) / F.sqrt(var),
        ).alias("z"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    period: int,
    max_len: int = _MAX_LEN_DEFAULT,
) -> DataFrame:
    """``(by..., period, n, s, var_s, z)`` — the seasonal (Hirsch-
    Slack) Mann-Kendall test (L295): monotone trend in a SEASONAL
    series without the seasonality faking (or masking) it — L161's
    pair lattice runs WITHIN each phase (same weekday vs same
    weekday), then the per-phase statistics combine:

        S = Σ_phase S_p,   Var = Σ_phase Var_p,
        Z = (S ∓ 1)/√Var   (continuity-corrected, 0 at S = 0)

    Phase = order_col mod period (the caller's lattice contract: an
    integer day/hour index, gap-free per the L163 discipline).  S is
    an exact integer; the per-phase variances are fixed trees summed
    by an order-pinned fold over the sorted phase list.  All-tied
    phases (Var = 0) → NULL z.

    Scale shape: inherits L161's bounded pair lattice per (key,
    phase) — the phase split only SHRINKS each lattice.

    No reference counterpart; trend analytics per SURVEY §2.11.
    """
    if period < 2:
        raise ValueError("seasonal_mann_kendall: period must be >= 2")
    tagged = df.withColumn(
        "_phase", F.pmod(F.col(order_col).cast("long"), F.lit(period))
    )
    mk = mann_kendall(
        tagged, [*by, "_phase"], order_col, value_col, max_len
    )
    packed = mk.groupBy(*by).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sort_array(
            F.collect_list(F.struct("_phase", "var_s"))
        ).alias("_lv"),
    )
    var_tot = F.aggregate(
        F.col("_lv"), F.lit(0.0), lambda a, e: a + e["var_s"]
    )
    s1 = packed.select(*by, "n", "s", var_tot.alias("var_s"))
    z = (
        F.when(
            F.col("s") > 0,
            (F.col("s") - F.lit(1)).cast("double")
            / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s") < 0,
            (F.col("s") + F.lit(1)).cast("double")
            / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return s1.select(
        *by,
        F.lit(period).alias("period"),
        "n",
        "s",
        "var_s",
        F.when(F.col("var_s") > 0.0, z).alias("z"),
    )


def seasonal_theil_sen(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    period: int,
    max_len: int = _MAX_LEN_DEFAULT,
) -> DataFrame:
    """``(by..., period, n_slopes, slope)`` — the seasonal Theil-Sen
    slope (L307, Hirsch's seasonal Kendall slope): the robust trend
    RATE for a seasonal series — pairwise slopes are computed only
    WITHIN each phase (same weekday vs same weekday, so the seasonal
    cycle never enters a slope) and the estimate is the exact median
    of the POOLED slope multiset across phases — the magnitude
    companion to the seasonal Mann-Kendall direction test (L295):

        slope = median{ (x_j − x_i)/(t_j − t_i) : phase(i)=phase(j) }

    Phase = order_col mod period (the L295 lattice contract).  Each
    slope is one IEEE division; the median is an exact order
    statistic over the sorted pooled list (the L162 floored-index
    discipline).  Per-(key, phase) series beyond ``max_len`` refused.

    Scale shape: the L162 in-row pair lattice per (key, phase), then
    one (key) collect of the bounded slope multiset.

    No reference counterpart; trend analytics per SURVEY §2.11.
    """
    if period < 2:
        raise ValueError("seasonal_theil_sen: period must be >= 2")
    tagged = df.withColumn(
        "_phase", F.pmod(F.col(order_col).cast("long"), F.lit(period))
    )
    packed = _packed(
        tagged, [*by, "_phase"], order_col, value_col, max_len
    )
    pairs = _pairs(packed, [*by, "_phase"]).filter(
        F.col("_q._t") != F.col("_p._t")
    )
    slope = (F.col("_q._x") - F.col("_p._x")) / (
        F.col("_q._t") - F.col("_p._t")
    )
    pooled = pairs.groupBy(*by).agg(
        F.sort_array(F.collect_list(slope)).alias("_s")
    )
    k = F.size("_s")
    mid_hi = F.element_at("_s", (F.floor(k / 2) + 1).cast("int"))
    mid_lo = F.element_at("_s", F.floor((k + 1) / 2).cast("int"))
    median = F.when(k % 2 == 1, mid_hi).otherwise(
        (mid_lo + mid_hi) / F.lit(2.0)
    )
    return pooled.select(
        *by,
        F.lit(period).alias("period"),
        k.alias("n_slopes"),
        F.when(k > 0, median).alias("slope"),
    )


def records_test(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    max_len: int = 1_000_000,
) -> DataFrame:
    """``(by..., n, n_records, expected, z)`` — the records test
    (L308): count strict running maxima and compare with the i.i.d.
    expectation — under exchangeability the i-th observation is a
    record with probability exactly 1/i, so

        E[R] = Σ 1/i = Hₙ,   Var[R] = Σ (1/i − 1/i²)
        z = (R − E)/sqrt(Var)

    — a one-window randomness/trend screen that is SCALE-FREE (only
    comparisons) and catches the drift that makes "record highs every
    week" headlines.  R is an exact integer (running-max window,
    strict; ties never count); the harmonic sums are order-pinned
    in-array folds over 1..n (``max_len`` bounds the in-row array).
    The first observation is always a record.  NULLs refused.

    Scale shape: one keyed window pass + one combinable agg + bounded
    harmonic folds on the one aggregate row per key.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"records_test: {n_null} NULL value(s) — impute first"
            )
    sizes = df.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"records_test: a series exceeds max_len={max_len}"
            )
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wprev = wt.rowsBetween(Window.unboundedPreceding, -1)
    prev_max = F.max(value_col).over(wprev)
    is_rec = prev_max.isNull() | (F.col(value_col) > prev_max)
    agg = df.select(*by, is_rec.cast("long").alias("_r")).groupBy(
        *by
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_r").alias("n_records"),
    )
    idx = F.sequence(F.lit(1), F.col("n"))
    e = F.aggregate(
        idx,
        F.lit(0.0),
        lambda a, i: a + F.lit(1.0) / i.cast("double"),
    )
    var = F.aggregate(
        idx,
        F.lit(0.0),
        lambda a, i: a
        + (
            F.lit(1.0) / i.cast("double")
            - F.lit(1.0) / (i.cast("double") * i.cast("double"))
        ),
    )
    s1 = agg.select(
        *by, "n", "n_records", e.alias("expected"), var.alias("_var")
    )
    return s1.select(
        *by,
        "n",
        "n_records",
        "expected",
        F.when(
            F.col("_var") > 0.0,
            (F.col("n_records").cast("double") - F.col("expected"))
            / F.sqrt(F.col("_var")),
        ).alias("z"),
    )


def siegel_slope(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    max_len: int = _MAX_LEN_DEFAULT,
) -> DataFrame:
    """``(by..., n, slope, intercept)`` — Siegel's repeated-median
    regression (L356): the 50%-breakdown big sibling of Theil-Sen
    (L162, ~29%) — HALF the points can be garbage and the line still
    stands, the strongest simple robust trend there is:

        slope = med_i ( med_{j≠i} (x_j − x_i)/(t_j − t_i) )
        intercept = med_i ( x_i − slope·t_i )

    Every median uses the L162 pinned convention (floored-index
    order statistics; even counts average the two middles in DOUBLE).
    The inner medians ride the SAME bounded in-row pair lattice as
    L161/L162 (> ``max_len`` rows per key refused loudly), expanded
    in BOTH directions so each point sees all its partners.  Points
    sharing a t with every partner have no defined inner median and
    are dropped from the outer one (documented; equal-t pairs are
    excluded as in L162).

    Scale shape: one keyed collect (bounded) → in-row lattice → two
    nested order-statistic picks.

    No reference counterpart; robust-trend analytics per SURVEY §2.11
    (Siegel 1982).
    """
    packed = _packed(df, by, order_col, value_col, max_len)
    e1 = packed.select(*by, "_a", F.posexplode("_a").alias("_i", "_p"))
    e2 = e1.select(
        *by, "_i", "_p", F.posexplode("_a").alias("_j", "_q")
    )
    pairs = e2.filter(
        (F.col("_i") != F.col("_j"))
        & (F.col("_q._t") != F.col("_p._t"))
    )
    slope = (F.col("_q._x") - F.col("_p._x")) / (
        F.col("_q._t") - F.col("_p._t")
    )
    inner = pairs.groupBy(*by, "_i").agg(
        F.sort_array(F.collect_list(slope)).alias("_s"),
        F.first("_p").alias("_pt"),
    )

    def _med(arr):
        k = F.size(arr)
        hi = F.element_at(arr, (F.floor(k / 2) + 1).cast("int"))
        lo = F.element_at(arr, F.floor((k + 1) / 2).cast("int"))
        return F.when(k % 2 == 1, hi).otherwise(
            (lo + hi) / F.lit(2.0)
        )

    med_i = inner.select(
        *by, "_pt", _med(F.col("_s")).alias("_mi")
    )
    outer = med_i.groupBy(*by).agg(
        F.sort_array(F.collect_list("_mi")).alias("_ms"),
        F.count(F.lit(1)).alias("_nm"),
    )
    b_df = outer.select(
        *by, _med(F.col("_ms")).alias("slope")
    )
    resid = (
        med_i.join(F.broadcast(b_df), by)
        .select(
            *by,
            (
                F.col("_pt._x") - F.col("slope") * F.col("_pt._t")
            ).alias("_r"),
        )
        .groupBy(*by)
        .agg(
            F.sort_array(F.collect_list("_r")).alias("_rs"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return b_df.join(resid, by).select(
        *by,
        "n",
        "slope",
        F.when(
            F.col("slope").isNotNull(), _med(F.col("_rs"))
        ).alias("intercept"),
    )
