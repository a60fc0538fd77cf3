"""Survival / retention analysis (L159/L160): the Kaplan-Meier
product-limit estimator and the two-sample log-rank test — how user
retention, document lifetime, and churn are actually analyzed, with
right-censoring handled correctly (dropping censored rows biases the
curve; so does treating them as events).

Determinism discipline: durations live on a BOUNDED grid (days,
weeks — the practical retention shape; thousands of distinct values
at worst, REFUSED loudly beyond ``max_points``), so every per-group
time series fits a collected sorted list.  Risk sets are EXACT
integers (a window cumsum); the running product

    S(t) = Π_{s ≤ t} (n_s − d_s)/n_s

is a 1.0-prepended left-assoc fold over the t-sorted prefix — addend
(factor) order pinned, each factor one IEEE division, no-event times
contribute exactly 1.0.  The log-rank statistic folds the bounded
grid the same way:

    O₁−E₁ = Σ_t (d₁ − d·n₁/n),
    V     = Σ_t d·(n₁/n)·(n₂/n)·(n−d)/(n−1),   χ² = (O₁−E₁)²/V

Scale shape: one combinable groupBy over the fact table → a bounded
per-group grid; the cumsum/fold work is grid-sized.  100 TB of events
is scanned once; nothing quadratic in ROWS (the per-t prefix fold is
quadratic in the bounded GRID — ≤10⁶ fold steps at the 10³ cap).

No reference counterpart; cohort/retention analytics per SURVEY §2.11
(composes with L114 cohort retention and L147/L131 drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def _grid(df, by, duration_col, event_col, max_points):
    """(by..., t, d, c, n) — events/censored per distinct duration plus
    the exact integer at-risk count; refuses an unbounded grid."""
    flt = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    ev = F.col(event_col).cast("int")
    pts = flt.groupBy(*by, F.col(duration_col).cast("long").alias("t")).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
    )
    n_pts = pts.groupBy(*by).count()
    if validation_enabled():
        too_big = n_pts.filter(F.col("count") > max_points).count()
        if too_big:
            raise ValueError(
                f"survival grid exceeds max_points={max_points} distinct "
                "durations in at least one group — bucket durations to a "
                "coarser grid (days/weeks) first; an unbounded grid breaks "
                "the ordered-fold determinism contract"
            )
    w = (
        Window.partitionBy(*by)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.partitionBy(*by)
    return pts.withColumn(
        "n",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0)),
    )


def kaplan_meier(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """``(by..., t, n_risk, n_events, n_censored, survival)`` — the KM
    curve per group.  ``event_col`` is 1 = event observed, 0 = right-
    censored at t.  NULLs excluded; grids above ``max_points`` distinct
    durations per group are refused (bucket first)."""
    grid = _grid(df, by, duration_col, event_col, max_points)
    arr = F.sort_array(
        F.collect_list(F.struct("t", "d", "c", "n"))
    ).alias("_a")
    packed = grid.groupBy(*by).agg(arr)
    s = F.explode("_a").alias("_s")
    rows = packed.select(*by, "_a", s)
    surv = F.aggregate(
        F.filter("_a", lambda x: x["t"] <= F.col("_s.t")),
        F.lit(1.0),
        lambda acc, x: acc
        * ((x["n"] - x["d"]).cast("double") / x["n"].cast("double")),
    )
    return rows.select(
        *by,
        F.col("_s.t").alias("t"),
        F.col("_s.n").alias("n_risk"),
        F.col("_s.d").alias("n_events"),
        F.col("_s.c").alias("n_censored"),
        surv.alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    duration_col: str,
    event_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """One row ``(n_a, n_b, o1, e1, v, chi2)`` — two-sample log-rank
    over the pooled duration grid; rows of other groups are ignored.
    chi2 is NULL when V = 0 (no events, or one arm empty at every
    event time)."""
    flt = df.filter(F.col(group_col).isin([group_a, group_b]))
    tagged = flt.select(
        (F.col(group_col) == group_a).cast("int").alias("_ga"),
        F.col(duration_col).alias("_t"),
        F.col(event_col).alias("_e"),
    )
    # per-arm grids on the pooled time axis, then the fold
    ev = F.col("_e").cast("int")
    pts = tagged.filter(F.col("_t").isNotNull() & F.col("_e").isNotNull()).groupBy(
        F.col("_t").cast("long").alias("t")
    ).agg(
        F.sum(ev * F.col("_ga")).alias("d1"),
        F.sum(ev * (F.lit(1) - F.col("_ga"))).alias("d2"),
        F.sum((F.lit(1) - ev) * F.col("_ga")).alias("c1"),
        F.sum((F.lit(1) - ev) * (F.lit(1) - F.col("_ga"))).alias("c2"),
    )
    if validation_enabled():
        n_pts = pts.count()
        if n_pts > max_points:
            raise ValueError(
                f"logrank grid has {n_pts} distinct durations > "
                f"max_points={max_points} — bucket durations first"
            )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    out1 = F.col("d1") + F.col("c1")
    out2 = F.col("d2") + F.col("c2")
    risk = pts.withColumn(
        "n1",
        F.sum(out1).over(tot) - F.coalesce(F.sum(out1).over(w), F.lit(0)),
    ).withColumn(
        "n2",
        F.sum(out2).over(tot) - F.coalesce(F.sum(out2).over(w), F.lit(0)),
    )
    nd = (F.col("n1") + F.col("n2")).cast("double")
    dd = (F.col("d1") + F.col("d2")).cast("double")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    oe_term = F.col("d1").cast("double") - dd * n1d / nd
    v_term = F.when(
        (F.col("n1") + F.col("n2")) > 1,
        dd * (n1d / nd) * (n2d / nd)
        * ((nd - dd) / (nd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    # fold the bounded grid in t order for the float sums
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("t"), oe_term.alias("oe"), v_term.alias("v")))
    )
    stats = risk.agg(
        F.sum(F.col("d1") + F.col("c1")).alias("n_a"),
        F.sum(F.col("d2") + F.col("c2")).alias("n_b"),
        F.sum("d1").alias("o1"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x["oe"]).alias("_oe"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x["v"]).alias("v"),
    )
    return stats.select(
        "n_a",
        "n_b",
        "o1",
        (F.col("o1").cast("double") - F.col("_oe")).alias("e1"),
        "v",
        F.when(
            F.col("v") > 0.0, (F.col("_oe") * F.col("_oe")) / F.col("v")
        ).alias("chi2"),
    )


def nelson_aalen(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """``(by..., t, n_risk, n_events, n_censored, cumhaz,
    var_cumhaz)`` — the Nelson-Aalen cumulative-hazard estimator
    (L254): the additive sibling of Kaplan-Meier (L159 multiplies
    survival factors; NA sums hazard increments d/n, which is the
    better-behaved quantity for small risk sets and the natural input
    to hazard-ratio eyeballing before a formal L160 log-rank):

        H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ,    Var = Σ_{tᵢ≤t} dᵢ/nᵢ²

    Rides the SAME bounded grid core as L159/L160 (exact integer risk
    sets, max_points refusal, NULL exclusion); each increment is one
    fixed IEEE tree and both prefix sums are t-sorted bounded folds —
    bit-identical, ungridded.

    Scale shape: identical to L159.

    No reference counterpart; survival analytics per SURVEY §2.11.
    """
    grid = _grid(df, by, duration_col, event_col, max_points)
    arr = F.sort_array(
        F.collect_list(F.struct("t", "d", "c", "n"))
    ).alias("_a")
    packed = grid.groupBy(*by).agg(arr)
    s = F.explode("_a").alias("_s")
    rows = packed.select(*by, "_a", s)
    prefix = F.filter("_a", lambda x: x["t"] <= F.col("_s.t"))
    cumhaz = F.aggregate(
        prefix,
        F.lit(0.0),
        lambda acc, x: acc + x["d"].cast("double") / x["n"].cast("double"),
    )
    var = F.aggregate(
        prefix,
        F.lit(0.0),
        lambda acc, x: acc
        + x["d"].cast("double")
        / (x["n"].cast("double") * x["n"].cast("double")),
    )
    return rows.select(
        *by,
        F.col("_s.t").alias("t"),
        F.col("_s.n").alias("n_risk"),
        F.col("_s.d").alias("n_events"),
        F.col("_s.c").alias("n_censored"),
        cumhaz.alias("cumhaz"),
        var.alias("var_cumhaz"),
    )


def cumulative_incidence(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    cause_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """``(by..., cause, t, n_risk, n_events, cif)`` — the
    Aalen-Johansen cumulative incidence function under COMPETING risks
    (L258): the probability of failing from THIS cause by time t when
    other causes can strike first — the estimator that fixes the
    classic mistake of running per-cause KM (L159) with competitors
    censored (which overstates every cause's incidence):

        CIF_k(t) = Σ_{s≤t} Ŝ(s⁻) · d_ks / n_s
        Ŝ(s⁻)    = Π_{u<s} (n_u − d_u)/n_u    (ALL-cause KM)

    ``cause_col`` is 0 = right-censored, ≥ 1 = failure cause.  Rides
    the L159 bounded-grid discipline: exact integer risk sets and
    per-cause event counts, t-sorted bounded folds with a nested
    prefix-product lookup (grid² work per row — bounded by
    ``max_points``, refused loudly beyond); every factor a fixed IEEE
    tree — bit-identical, ungridded.  Negative causes refused.  At a
    single cause, CIF = 1 − KM survival (pinned by test).

    Scale shape: one (keys, t) groupBy + one (keys, cause, t) groupBy
    + per-key bounded arrays.  100 TB scans once.

    No reference counterpart; survival analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(duration_col).isNotNull() & F.col(cause_col).isNotNull()
    )
    if validation_enabled():
        n_neg = flt.filter(F.col(cause_col) < 0).count()
        if n_neg:
            raise ValueError(
                f"cumulative_incidence: {n_neg} negative cause code(s) — "
                "0 = censored, >= 1 = failure cause"
            )
    ev = (F.col(cause_col) > 0).cast("int")
    pts = flt.groupBy(
        *by, F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
    )
    n_pts = pts.groupBy(*by).count()
    if validation_enabled():
        too_big = n_pts.filter(F.col("count") > max_points).count()
        if too_big:
            raise ValueError(
                f"cumulative_incidence: grid exceeds max_points="
                f"{max_points} distinct durations — bucket durations first"
            )
    w = (
        Window.partitionBy(*by)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.partitionBy(*by)
    grid = pts.withColumn(
        "n",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0)),
    )
    packed = grid.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias("_a")
    )
    ck = (
        flt.filter(F.col(cause_col) > 0)
        .groupBy(
            *by,
            F.col(cause_col).cast("long").alias("cause"),
            F.col(duration_col).cast("long").alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("dk"))
    )
    karr = ck.groupBy(*by, "cause").agg(
        F.sort_array(F.collect_list(F.struct("t", "dk"))).alias("_k")
    )
    joined = (
        karr.join(packed, list(by)) if by else karr.crossJoin(packed)
    )
    rows = joined.select(
        *by, "cause", "_k", "_a", F.explode("_k").alias("_e")
    )

    def _surv_before(et):
        return F.aggregate(
            F.filter(F.col("_a"), lambda x: x["t"] < et),
            F.lit(1.0),
            lambda acc, x: acc
            * ((x["n"] - x["d"]).cast("double") / x["n"].cast("double")),
        )

    def _n_at(et):
        return F.element_at(
            F.filter(F.col("_a"), lambda x: x["t"] == et), 1
        )["n"]

    cif = F.aggregate(
        F.filter(F.col("_k"), lambda e: e["t"] <= F.col("_e.t")),
        F.lit(0.0),
        lambda acc, e: acc
        + _surv_before(e["t"])
        * (e["dk"].cast("double") / _n_at(e["t"]).cast("double")),
    )
    return rows.select(
        *by,
        "cause",
        F.col("_e.t").alias("t"),
        _n_at(F.col("_e.t")).alias("n_risk"),
        F.col("_e.dk").alias("n_events"),
        cif.alias("cif"),
    )


def rmst(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    tau: float,
    max_points: int = 1000,
) -> DataFrame:
    """``(by..., tau, n, events, rmst)`` — restricted mean survival
    time (L275): the area under the Kaplan-Meier curve up to horizon
    τ — "average survival time over the first τ days", the
    clinically/operationally interpretable scalar that the median
    survival time cannot give when the curve never crosses 0.5
    (common for retention), and the standard effect measure when
    proportional hazards fail:

        RMST(τ) = ∫₀^τ Ŝ(t) dt
                = Σᵢ Ŝ(tᵢ₋₁)·(min(tᵢ,τ) − min(tᵢ₋₁,τ)) + Ŝ·tail

    One LEFT FOLD over the bounded L159 grid with a
    (prev_t, survival, area) accumulator — per step: area accrues at
    the PRE-step survival, then the KM factor (n−d)/n multiplies in;
    the oracle drives the identical tree with the accumulator encoded
    as a 3-double LIST (list_reduce needs homogeneous types).  τ ≤ 0
    refused; negative durations refused; groups with no rows cannot
    occur.

    Scale shape: inherits L159's — one combinable groupBy to the
    bounded grid, one window cumsum, one bounded fold.

    No reference counterpart; retention analytics per SURVEY §2.11.
    """
    if not tau > 0:
        raise ValueError("rmst: tau must be > 0")
    if validation_enabled():
        n_neg = df.filter(F.col(duration_col) < 0).count()
        if n_neg:
            raise ValueError(f"rmst: {n_neg} negative duration(s)")
    grid = _grid(df, by, duration_col, event_col, max_points)
    packed = grid.groupBy(*by).agg(
        F.max("n").alias("n"),
        F.sum("d").alias("events"),
        F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias(
            "_a"
        ),
    )
    tv = F.lit(float(tau))
    init = F.struct(
        F.lit(0.0).alias("prev"),
        F.lit(1.0).alias("s"),
        F.lit(0.0).alias("area"),
    )

    def step(acc, x):
        td = x["t"].cast("double")
        factor = (x["n"] - x["d"]).cast("double") / x["n"].cast(
            "double"
        )
        area = acc["area"] + acc["s"] * (
            F.least(td, tv) - F.least(acc["prev"], tv)
        )
        return F.struct(
            td.alias("prev"),
            (acc["s"] * factor).alias("s"),
            area.alias("area"),
        )

    acc = F.aggregate(F.col("_a"), init, step)
    total = acc["area"] + acc["s"] * F.greatest(
        tv - F.least(acc["prev"], tv), F.lit(0.0)
    )
    return packed.select(
        *by,
        tv.alias("tau"),
        "n",
        "events",
        total.alias("rmst"),
    )


def harrell_c(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    risk_col: str,
    max_len: int = 1000,
) -> DataFrame:
    """``(by..., n, n_comparable, n_concordant, n_tied_risk, c)`` —
    Harrell's concordance index (L288): does a risk score ORDER the
    survival outcomes — the AUC of survival analysis, censoring
    handled by only scoring COMPARABLE pairs (the earlier time must
    be an observed event, else we cannot know who outlived whom):

        comparable (i,j):  tᵢ < tⱼ and eᵢ = 1
        concordant:        rᵢ > rⱼ   (higher risk died sooner)
        C = (concordant + ½·risk-ties) / comparable

    All counts are exact integers over the bounded per-group pair
    lattice (the L161/L162 ``max_len`` discipline — C is pairwise by
    definition; resample or score a sample of each group first);
    equal-time pairs are not comparable and never counted.  Zero
    comparable pairs → NULL c.

    Scale shape: one keyed collect (bounded by contract) → in-row
    posexplode pair lattice → one combinable agg.

    No reference counterpart; retention analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(risk_col).isNotNull()
    )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"harrell_c: a group exceeds max_len={max_len} — C is "
                "pairwise; score a bounded sample per group"
            )
    packed = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_list(
            F.struct(
                F.col(duration_col).alias("t"),
                F.col(event_col).cast("int").alias("e"),
                F.col(risk_col).alias("r"),
            )
        ).alias("_a"),
    )
    e1 = packed.select(
        *by, "n", "_a", F.posexplode("_a").alias("_i", "_p")
    )
    e2 = e1.select(
        *by, "n", "_i", "_p", F.posexplode("_a").alias("_j", "_q")
    ).filter(F.col("_i") < F.col("_j"))
    p, q = F.col("_p"), F.col("_q")
    first_earlier = (p["t"] < q["t"]) & (p["e"] == 1)
    second_earlier = (q["t"] < p["t"]) & (q["e"] == 1)
    comparable = first_earlier | second_earlier
    early_r = F.when(first_earlier, p["r"]).otherwise(q["r"])
    late_r = F.when(first_earlier, q["r"]).otherwise(p["r"])
    conc = comparable & (early_r > late_r)
    tied = comparable & (early_r == late_r)
    agg = e2.groupBy(*by, "n").agg(
        F.sum(comparable.cast("long")).alias("n_comparable"),
        F.sum(conc.cast("long")).alias("n_concordant"),
        F.sum(tied.cast("long")).alias("n_tied_risk"),
    )
    c = (
        F.col("n_concordant").cast("double")
        + F.lit(0.5) * F.col("n_tied_risk").cast("double")
    ) / F.col("n_comparable").cast("double")
    return agg.select(
        *by,
        "n",
        "n_comparable",
        "n_concordant",
        "n_tied_risk",
        F.when(F.col("n_comparable") > 0, c).alias("c"),
    )


def kaplan_meier_ci(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    z: float = 1.96,
    max_points: int = 1000,
) -> DataFrame:
    """``(by..., t, n_risk, n_events, survival, se, ci_lo, ci_hi)`` —
    the L159 Kaplan-Meier curve with Greenwood confidence bands
    (L294): the plain-scale interval S(t) ± z·se(t) with

        se(t) = S(t) · sqrt( Σ_{s≤t} d_s / (n_s·(n_s − d_s)) )

    (Greenwood 1926; the log-log transform variant is deliberately
    NOT emitted — plain scale is what the retention dashboards the
    L159 family feeds actually plot, clamped to [0, 1]).  Both the
    survival product and the Greenwood sum are t-sorted prefix folds
    over the bounded grid; when a grid point exhausts the risk set
    (n = d, S hits 0), the Greenwood term is undefined and se/bands
    go NULL from that point on — propagated by the fold itself, never
    a division by zero.

    Scale shape: inherits L159's exactly — one combinable groupBy to
    the bounded grid, one window cumsum, per-row bounded folds.

    No reference counterpart; retention analytics per SURVEY §2.11.
    """
    grid = _grid(df, by, duration_col, event_col, max_points)
    arr = F.sort_array(
        F.collect_list(F.struct("t", "d", "c", "n"))
    ).alias("_a")
    packed = grid.groupBy(*by).agg(arr)
    s = F.explode("_a").alias("_s")
    rows = packed.select(*by, "_a", s)
    prefix = F.filter("_a", lambda x: x["t"] <= F.col("_s.t"))
    surv = F.aggregate(
        prefix,
        F.lit(1.0),
        lambda acc, x: acc
        * ((x["n"] - x["d"]).cast("double") / x["n"].cast("double")),
    )
    gw = F.aggregate(
        prefix,
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(
            x["n"] > x["d"],
            x["d"].cast("double")
            / (x["n"].cast("double") * (x["n"] - x["d"]).cast("double")),
        ),
    )
    se = surv * F.sqrt(gw)
    zl = F.lit(float(z))
    # greatest/least IGNORE NULL args, which would resurrect a NULL
    # band as the clamp constant — guard on the Greenwood sum instead
    defined = gw.isNotNull()
    return rows.select(
        *by,
        F.col("_s.t").alias("t"),
        F.col("_s.n").alias("n_risk"),
        F.col("_s.d").alias("n_events"),
        surv.alias("survival"),
        se.alias("se"),
        F.when(defined, F.greatest(F.lit(0.0), surv - zl * se)).alias(
            "ci_lo"
        ),
        F.when(defined, F.least(F.lit(1.0), surv + zl * se)).alias(
            "ci_hi"
        ),
    )


def life_table(
    df: DataFrame,
    by: list[str],
    duration_col: str,
    event_col: str,
    width: int,
    max_points: int = 1000,
) -> DataFrame:
    """Actuarial life table (L379): ``(by..., interval, t_start,
    t_end, n_enter, d, c, n_eff, q, surv)`` — the fixed-interval
    sibling of the L159 KM curve (the insurance/demography estimator;
    also the right tool when durations are only known to interval
    precision): durations bucket to ``interval = t div width`` exact
    integer intervals, censored subjects count HALF in the interval
    they leave (the actuarial adjustment — censoring is assumed
    uniform within the interval),

        n_eff = n_enter − c/2,   q = d/n_eff,
        surv(k) = Π_{j ≤ k} (1 − d_j/n_eff_j)

    with ``surv`` the probability of surviving BEYOND interval k's
    end.  Risk sets are exact integer window cumsums; the product is
    a 1.0-prepended ascending-interval prefix fold (the L159 fold
    discipline), each factor one IEEE tree.  ``q`` is NULL when
    n_eff ≤ 0 (an all-censored interval's conditional risk is
    undefined; its fold factor is exactly 1.0 since d = 0 there).
    Intervals with no observations don't emit rows (they carry q = 0
    and factor 1 — absent by construction, documented here).
    Grids beyond ``max_points`` intervals per group are REFUSED.

    Scale shape: one combinable (by, interval) groupBy → bounded
    per-group grid; the fold work is grid-sized (≤10⁶ steps at the
    cap).  100 TB scanned once.

    No reference counterpart; survival analytics per SURVEY §2.11
    (composes with L159/L160/L227/L242)."""
    if width < 1:
        raise ValueError("life_table: width must be >= 1")
    flt = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    )
    ev = F.col(event_col).cast("int")
    pts = flt.groupBy(
        *by,
        F.expr(f"CAST({duration_col} AS BIGINT) div {int(width)}").alias(
            "interval"
        ),
    ).agg(
        F.sum(ev).alias("d"),
        F.sum(F.lit(1) - ev).alias("c"),
    )
    n_pts = pts.groupBy(*by).count()
    if validation_enabled():
        too_big = n_pts.filter(F.col("count") > max_points).count()
        if too_big:
            raise ValueError(
                f"life_table grid exceeds max_points={max_points} intervals "
                "in at least one group — widen the interval width; an "
                "unbounded grid breaks the ordered-fold determinism contract"
            )
    w = (
        Window.partitionBy(*by)
        .orderBy("interval")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = Window.partitionBy(*by)
    risk = pts.withColumn(
        "n_enter",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0)),
    )
    packed = risk.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct("interval", "d", "c", "n_enter"))
        ).alias("_a")
    )
    rows = packed.select(*by, "_a", F.explode("_a").alias("_s"))

    def _neff(x):
        return x["n_enter"].cast("double") - x["c"].cast("double") / F.lit(
            2.0
        )

    surv = F.aggregate(
        F.filter("_a", lambda x: x["interval"] <= F.col("_s.interval")),
        F.lit(1.0),
        lambda acc, x: acc
        * F.when(
            _neff(x) > F.lit(0.0),
            F.lit(1.0) - x["d"].cast("double") / _neff(x),
        ).otherwise(F.lit(1.0)),
    )
    s = F.col("_s")
    n_eff = _neff(s)
    return rows.select(
        *by,
        s["interval"].alias("interval"),
        (s["interval"] * F.lit(int(width))).alias("t_start"),
        ((s["interval"] + F.lit(1)) * F.lit(int(width))).alias("t_end"),
        s["n_enter"].alias("n_enter"),
        s["d"].alias("d"),
        s["c"].alias("c"),
        n_eff.alias("n_eff"),
        F.when(
            n_eff > F.lit(0.0), s["d"].cast("double") / n_eff
        ).alias("q"),
        surv.alias("surv"),
    )


def weighted_logrank(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    duration_col: str,
    event_col: str,
    weight: str = "gehan",
    max_points: int = 1000,
) -> DataFrame:
    """Weighted two-sample log-rank family (L380): one row ``(n_a,
    n_b, o1, z, v, chi2, weight)`` — the L160 log-rank weights every
    event time equally, which makes it blind to EARLY separation that
    later converges (treatment effects that wear off); the weighted
    family fixes which part of the curve the test listens to:

        weight='gehan'        w_t = n_t        (early times, exact ints
                                                — Gehan-Breslow)
        weight='tarone_ware'  w_t = √n_t       (the compromise)
        weight='peto'         w_t = S̃(t) = Π_{u≤t}(1 − d_u/(n_u+1))
                              (early-weighted but robust to censoring
                               imbalance — Peto-Peto per Kalbfleisch &
                               Prentice 1980 §4.2, S̃ INCLUDING t,
                               the convention pinned by test)
        weight='logrank'      w_t = 1          (reduces to L160,
                                                equality pinned by test)

        Z = Σ_t w_t·(d₁ − d·n₁/n),   V = Σ_t w_t²·v_t,
        χ² = Z²/V

    The grid, risk sets, and per-t O−E / hypergeometric-V terms are
    the exact L160 machinery; the weighted sums run as ONE ascending-t
    sequential struct fold whose accumulator carries (z, v, S̃) — the
    Peto survivor estimate updates inside the fold (the L371 slot
    discipline), so all four modes share one pinned IEEE evaluation
    order.  chi2 is NULL when V = 0.

    Scale shape: identical to L160 — one combinable grid groupBy, a
    bounded fold.  100 TB scanned once.

    No reference counterpart; survival analytics per SURVEY §2.11."""
    if weight not in ("gehan", "tarone_ware", "peto", "logrank"):
        raise ValueError(
            f"weighted_logrank: unknown weight {weight!r} — one of "
            "gehan/tarone_ware/peto/logrank"
        )
    flt = df.filter(F.col(group_col).isin([group_a, group_b]))
    tagged = flt.select(
        (F.col(group_col) == group_a).cast("int").alias("_ga"),
        F.col(duration_col).alias("_t"),
        F.col(event_col).alias("_e"),
    )
    ev = F.col("_e").cast("int")
    pts = tagged.filter(
        F.col("_t").isNotNull() & F.col("_e").isNotNull()
    ).groupBy(F.col("_t").cast("long").alias("t")).agg(
        F.sum(ev * F.col("_ga")).alias("d1"),
        F.sum(ev * (F.lit(1) - F.col("_ga"))).alias("d2"),
        F.sum((F.lit(1) - ev) * F.col("_ga")).alias("c1"),
        F.sum((F.lit(1) - ev) * (F.lit(1) - F.col("_ga"))).alias("c2"),
    )
    if validation_enabled():
        n_pts = pts.count()
        if n_pts > max_points:
            raise ValueError(
                f"weighted_logrank grid has {n_pts} distinct durations > "
                f"max_points={max_points} — bucket durations first"
            )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    out1 = F.col("d1") + F.col("c1")
    out2 = F.col("d2") + F.col("c2")
    risk = pts.withColumn(
        "n1",
        F.sum(out1).over(tot) - F.coalesce(F.sum(out1).over(w), F.lit(0)),
    ).withColumn(
        "n2",
        F.sum(out2).over(tot) - F.coalesce(F.sum(out2).over(w), F.lit(0)),
    )
    nd = (F.col("n1") + F.col("n2")).cast("double")
    dd = (F.col("d1") + F.col("d2")).cast("double")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    oe_term = F.col("d1").cast("double") - dd * n1d / nd
    v_term = F.when(
        (F.col("n1") + F.col("n2")) > 1,
        dd * (n1d / nd) * (n2d / nd) * ((nd - dd) / (nd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("t"),
                nd.alias("nt"),
                dd.alias("dt"),
                oe_term.alias("oe"),
                v_term.alias("vt"),
            )
        )
    )

    def _w(x, acc):
        if weight == "gehan":
            return x["nt"]
        if weight == "tarone_ware":
            return F.sqrt(x["nt"])
        if weight == "peto":
            return acc["s"] * (
                F.lit(1.0) - x["dt"] / (x["nt"] + F.lit(1.0))
            )
        return F.lit(1.0)

    def _step(acc, x):
        wt = _w(x, acc)
        return F.struct(
            (acc["z"] + wt * x["oe"]).alias("z"),
            (acc["v"] + wt * wt * x["vt"]).alias("v"),
            (
                acc["s"]
                * (F.lit(1.0) - x["dt"] / (x["nt"] + F.lit(1.0)))
            ).alias("s"),
        )

    init = F.struct(
        F.lit(0.0).alias("z"), F.lit(0.0).alias("v"), F.lit(1.0).alias("s")
    )
    stats = risk.agg(
        F.sum(out1).alias("n_a"),
        F.sum(out2).alias("n_b"),
        F.sum("d1").alias("o1"),
        F.aggregate(arr, init, _step).alias("_acc"),
    )
    return stats.select(
        "n_a",
        "n_b",
        "o1",
        F.col("_acc")["z"].alias("z"),
        F.col("_acc")["v"].alias("v"),
        F.when(
            F.col("_acc")["v"] > 0.0,
            (F.col("_acc")["z"] * F.col("_acc")["z"]) / F.col("_acc")["v"],
        ).alias("chi2"),
        F.lit(weight).alias("weight"),
    )
