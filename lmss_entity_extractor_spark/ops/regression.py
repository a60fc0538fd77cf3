"""Grouped linear regression (L135): per-group OLS trendlines —
slope / intercept / R² — from combinable sufficient statistics, the
ANSI-SQL ``REGR_SLOPE`` family re-expressed for cross-engine
bit-identity ("is revenue trending with quantity, per segment" — the
classic warehouse trendline op).

Exactness discipline: float SUMs are order-dependent across engines,
so the sufficient statistics are summed as DECIMAL — inputs cast to
``DECIMAL(18, scale)`` (exact for cents-style data), products widen to
``DECIMAL(37, 2·scale)``, sums to ``DECIMAL(38, ·)`` — all EXACT and
order-insensitive, so any partition order and any engine produce the
same six numbers.  Only then does each statistic cast to double
(IEEE round-to-nearest, deterministic) and flow through ONE fixed
expression tree:

    slope     = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
    intercept = (Sy − slope·Sx) / n
    r²        = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²)·(n·Syy − Sy²))

— a handful of IEEE-specified ops on identical operands ⇒ bit-identical
on Spark and the DuckDB oracle with NO rounding grid.  Degenerate
groups (zero x-variance, incl. n = 1) yield NULL slope/intercept/r²
rather than ±inf; zero y-variance yields NULL r² (vertical fit is
exact but undefined correlation).

Scale: one map-side-combinable groupBy over six sums — the cheapest
possible shape; a 100 TB table is scanned once with no wide rows.
Overflow is loud: Spark runs ANSI mode, so a DECIMAL(38) sum overflow
fails the job rather than silently wrapping.

No reference counterpart; warehouse analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def grouped_linreg(
    df: DataFrame,
    group_cols: list[str],
    x: str,
    y: str,
    scale: int = 2,
) -> DataFrame:
    """``(group_cols..., n, slope, intercept, r2)`` — OLS of ``y`` on
    ``x`` per group.  ``x``/``y`` must be exactly representable at
    ``DECIMAL(18, scale)`` (e.g. integer quantities, cent-valued
    prices at the default scale=2) — that is what makes the sums, and
    therefore the fit, bit-identical across engines and partitionings.
    Rows where either side is NULL are excluded (REGR_* semantics)."""
    dec = f"decimal(18,{scale})"
    xd = F.col(x).cast(dec)
    yd = F.col(y).cast(dec)
    stats = (
        df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(xd * yd).alias("sxy"),
            F.sum(yd * yd).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    slope = F.when(varx_n != F.lit(0.0), cov_n / varx_n)
    intercept = F.when(
        varx_n != F.lit(0.0), (sy - (cov_n / varx_n) * sx) / n
    )
    r2 = F.when(
        (varx_n != F.lit(0.0)) & (vary_n != F.lit(0.0)),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    return stats.select(
        *group_cols,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def ols_influence(
    df: DataFrame,
    by: list[str],
    id_col: str,
    x_col: str,
    y_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., id, x, y, leverage, resid, cooks_d)`` — per-row
    influence diagnostics of the simple OLS fit (which rows DRIVE the
    L141 regression — the row-level answer the fit summary hides):

        h_i   = 1/n + (x_i − x̄)²/Sxx          (leverage)
        e_i   = y_i − (a + b·x_i)              (residual)
        D_i   = e_i²/(2·s²) · h_i/(1−h_i)²     (Cook's distance, p=2)

    with b, a, Sxx, Syy, Sxy, s² = (Syy − b·Sxy)/(n−2) all derived
    from the EXACT DECIMAL sufficient statistics of the L141
    discipline, broadcast back onto the rows (fit-small/apply-wide,
    the CUPED shape) — every per-row value is one fixed IEEE tree
    over the same doubles in every engine: bit-identical, ungridded.
    Groups with n ≤ 2, Sxx ≤ 0, or s² ≤ 0 yield NULL diagnostics;
    h = 1 rows (a two-point group's extremes) yield NULL cooks_d.

    Scale shape: ONE combinable groupBy + a broadcast join back;
    100 TB scans twice (stats pass + apply pass), both narrow."""
    dec = f"decimal(18,{scale})"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    flt = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    stats = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(yd * yd).alias("_syy"),
    )
    if by:
        st = stats
        cond = None
        for c in by:
            st = st.withColumnRenamed(c, f"_st_{c}")
            term = F.col(c).eqNullSafe(F.col(f"_st_{c}"))
            cond = term if cond is None else (cond & term)
        # null-safe equi-join: rows with a NULL by-key keep their
        # diagnostics (the sibling grouped operators emit NULL groups;
        # a plain inner join would silently drop them — review r4-2)
        joined = flt.join(F.broadcast(st), cond).drop(
            *[f"_st_{c}" for c in by]
        )
    else:
        joined = flt.crossJoin(F.broadcast(stats))
    nd = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    xbar = sx / nd
    sxx_c = sxx - sx * sx / nd
    sxy_c = sxy - sx * sy / nd
    syy_c = syy - sy * sy / nd
    b = sxy_c / sxx_c
    a = (sy - b * sx) / nd
    s2 = (syy_c - b * sxy_c) / (nd - F.lit(2.0))
    xi = F.col(x_col).cast("double")
    yi = F.col(y_col).cast("double")
    h = F.lit(1.0) / nd + (xi - xbar) * (xi - xbar) / sxx_c
    e = yi - (a + b * xi)
    cooks = (
        e * e / (F.lit(2.0) * s2) * (h / ((F.lit(1.0) - h) * (F.lit(1.0) - h)))
    )
    ok = (F.col("_n") > 2) & (sxx_c > 0) & (s2 > 0)
    return joined.select(
        *by,
        F.col(id_col).alias("id"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.when(ok, h).alias("leverage"),
        F.when(ok, e).alias("resid"),
        F.when(ok & (h < 1), cooks).alias("cooks_d"),
    )


def _bp_poly(power: int, x_shift: int = 0) -> str:
    """Engine-shared SQL for Σ xˢ·eᵖ with e = y − b0 − b1·x expanded
    multinomially over exact moment columns ``m{xpow}{ypow}`` (with
    ``m00`` ≡ ``nd``) and the fitted doubles ``b0``/``b1`` — the SAME
    text is parsed by Spark and DuckDB, so the IEEE tree is identical
    by construction.  Term order is pinned by the deterministic
    (i, j, k) iteration; powers are written as repeated products
    (no ``pow()``)."""
    import math as _m

    terms = []
    for i in range(power + 1):          # y power
        for j in range(power + 1 - i):  # x power
            k = power - i - j           # constant (−b0) power
            coef = _m.factorial(power) // (
                _m.factorial(i) * _m.factorial(j) * _m.factorial(k)
            )
            sign = -1 if (j + k) % 2 else 1
            xp = j + x_shift
            mom = "nd" if (xp == 0 and i == 0) else f"m{xp}{i}"
            factors = [f"{float(coef * sign)}"]
            factors += ["b1"] * j + ["b0"] * k + [mom]
            terms.append(" * ".join(factors))
    return "(" + " + ".join(terms) + ")"


def breusch_pagan(
    df: DataFrame,
    by: list[str],
    x: str,
    y: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, slope, lm, df_bp)`` — the Breusch-Pagan
    heteroskedasticity test (L270, Koenker's studentized form): after
    fitting y ~ x per group, do the SQUARED residuals still depend on
    x — the does-variance-grow-with-size gate that decides whether
    the L135 OLS standard errors can be trusted:

        LM = n · R²_aux,   e²ᵢ regressed on xᵢ,   df = 1

    No residual is ever materialized: Σe², Σx·e², Σe⁴ are multinomial
    expansions of (y − b0 − b1·x)ᵖ over the 14 EXACT integer
    micro-unit mixed moments Σ qxⁱ·qyʲ (i+j ≤ 4, the L266 trick) —
    one combinable aggregation, then one fixed IEEE polynomial tree
    per group, generated ONCE as SQL text and parsed by both engines
    (`_bp_poly`).  LM is invariant to the micro-unit scaling, so the
    tree runs in q-units.  Degenerate groups (n < 3, zero x-variance,
    zero e²-variance) → NULL lm.  DECIMAL(38,0) bounds the fourth
    moments: |q| ≤ 10⁷ supports ~10⁴ rows per group at the extreme,
    ~10⁸ for single-digit-scale values; ANSI fails loudly beyond.

    Scale shape: ONE combinable aggregation — one scan of 100 TB,
    output bounded by group cardinality.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    d0 = "decimal(38,0)"
    qx = (F.col(x).cast(dec) * F.lit(10**scale)).cast(d0)
    qy = (F.col(y).cast(dec) * F.lit(10**scale)).cast(d0)
    base = df.filter(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    ).select(*by, qx.alias("_qx"), qy.alias("_qy"))
    moments = [
        (i, j)
        for t in range(1, 5)
        for i in range(t + 1)
        for j in [t - i]
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, j in moments:
        prod = F.lit(1).cast(d0)
        for _ in range(i):
            prod = prod * F.col("_qx")
        for _ in range(j):
            prod = prod * F.col("_qy")
        aggs.append(F.sum(prod).alias(f"_m{i}{j}"))
    agg = base.groupBy(*by).agg(*aggs)
    m = agg.select(
        *by,
        "n",
        F.col("n").cast("double").alias("nd"),
        *[
            F.col(f"_m{i}{j}").cast("double").alias(f"m{i}{j}")
            for i, j in moments
        ],
    )
    f = m.select(
        *by,
        "n",
        "nd",
        *[f"m{i}{j}" for i, j in moments],
        F.expr(
            "CASE WHEN nd * m20 - m10 * m10 > 0.0 THEN "
            "(nd * m11 - m10 * m01) / (nd * m20 - m10 * m10) END"
        ).alias("b1"),
        F.expr("nd * m20 - m10 * m10").alias("sxx"),
    )
    f = f.withColumn(
        "b0", F.expr("(m01 - b1 * m10) / nd")
    )
    a = f.select(
        *by,
        "n",
        "nd",
        "m10",
        "sxx",
        "b1",
        F.expr(_bp_poly(2)).alias("a1"),
        F.expr(_bp_poly(2, x_shift=1)).alias("a2"),
        F.expr(_bp_poly(4)).alias("a3"),
    )
    r = a.select(
        *by,
        "n",
        "b1",
        "sxx",
        F.expr("nd * a3 - a1 * a1").alias("see"),
        F.expr("nd * a2 - m10 * a1").alias("sxe"),
        F.col("nd"),
    )
    lm = F.expr("nd * (sxe * sxe) / (sxx * see)")
    ok = (
        (F.col("n") >= 3)
        & (F.col("sxx") > 0.0)
        & (F.col("see") > 0.0)
    )
    return r.select(
        *by,
        "n",
        F.when(F.col("sxx") > 0.0, F.col("b1")).alias("slope"),
        F.when(ok, lm).alias("lm"),
        F.when(ok, F.lit(1)).alias("df_bp"),
    )


def deming_regression(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    lam: float = 1.0,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, slope, intercept)`` — Deming regression (L317):
    the line when BOTH variables carry measurement error — OLS (L135)
    assumes x is exact and attenuates the slope toward 0; Deming
    splits the residual between the axes by the error-variance ratio
    λ (λ = 1 ⇒ orthogonal regression), which is the right model for
    comparing two measured scores (the fit companion to Lin's CCC
    L315 / Bland-Altman L316):

        β = (s_y² − λ·s_x² + sqrt((s_y² − λ·s_x²)² + 4λ·s_xy²))
            / (2·s_xy)
        α = ȳ − β·x̄

    Closed form from the SAME five exact decimal sums as L315 — one
    fixed IEEE tree, no iteration.  s_xy = 0 → NULL (the line is
    axis-aligned and β is 0/0); n < 3 → NULL.

    Scale shape: ONE combinable aggregation.

    No reference counterpart; agreement analytics per SURVEY §2.11.
    """
    if not lam > 0:
        raise ValueError("deming_regression: lam must be > 0")
    dec = f"decimal(18,{scale})"
    # products multiply at (18,s) -> (37,2s) EXACTLY; a (38,s) upcast
    # would make Spark cap the product scale and round
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    agg = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("_sx"),
            F.sum(yd).alias("_sy"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(yd * yd).alias("_syy"),
            F.sum(xd * yd).alias("_sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx = (nd * sxx - sx * sx) / (nd * nd)
    vy = (nd * syy - sy * sy) / (nd * nd)
    cov = (nd * sxy - sx * sy) / (nd * nd)
    ll = F.lit(float(lam))
    disc = (vy - ll * vx) * (vy - ll * vx) + F.lit(4.0) * ll * cov * cov
    slope = (vy - ll * vx + F.sqrt(disc)) / (F.lit(2.0) * cov)
    ok = (F.col("n") >= 3) & (cov != 0.0)
    s1 = agg.select(
        *by,
        "n",
        F.when(ok, slope).alias("slope"),
        (sy / nd).alias("_my"),
        (sx / nd).alias("_mx"),
    )
    return s1.select(
        *by,
        "n",
        "slope",
        (F.col("_my") - F.col("slope") * F.col("_mx")).alias(
            "intercept"
        ),
    )


def did_estimator(
    df: DataFrame,
    by: list[str],
    treat_col: str,
    post_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, m00, m01, m10, m11, did, se, t)`` — the 2×2
    difference-in-differences estimator (L318): the workhorse causal
    panel design — did the TREATED group's pre→post change exceed the
    CONTROL group's (which absorbs the secular trend a naive
    before/after comparison would misattribute):

        DiD = (m̄_treat,post − m̄_treat,pre)
              − (m̄_ctrl,post − m̄_ctrl,pre)
        se = sqrt(Σ_cells s²_cell/n_cell)     (unpooled, Welch-style)

    All four cells' sufficient statistics come from ONE combinable
    aggregation (exact decimals); DiD/se/t are fixed IEEE trees.
    Any cell with n < 2 (or zero variance in all cells) → NULL se/t;
    a missing cell → NULL did.  ``treat_col``/``post_col`` are 0/1
    integer indicators (the caller's assignment encoding).

    Scale shape: ONE combinable aggregation over the panel.

    No reference counterpart; causal analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(treat_col).isin([0, 1])
        & F.col(post_col).isin([0, 1])
    )
    xd = F.col(value_col).cast(dec)
    g = F.col(treat_col).cast("int")
    p = F.col(post_col).cast("int")

    def cell(gg, pp, expr, name):
        return F.sum(
            F.when((g == gg) & (p == pp), expr)
        ).alias(name)

    aggs = [F.count(F.lit(1)).alias("n")]
    for gg in (0, 1):
        for pp in (0, 1):
            aggs += [
                F.sum(
                    F.when((g == gg) & (p == pp), 1).otherwise(0)
                ).alias(f"_n{gg}{pp}"),
                cell(gg, pp, xd, f"_s{gg}{pp}"),
                cell(gg, pp, xd * xd, f"_q{gg}{pp}"),
            ]
    agg = flt.groupBy(*by).agg(*aggs)

    def m(gg, pp):
        return F.col(f"_s{gg}{pp}").cast("double") / F.col(
            f"_n{gg}{pp}"
        ).cast("double")

    def vterm(gg, pp):
        ncell = F.col(f"_n{gg}{pp}").cast("double")
        sc = F.col(f"_s{gg}{pp}").cast("double")
        qc = F.col(f"_q{gg}{pp}").cast("double")
        var = (ncell * qc - sc * sc) / (
            ncell * (ncell - F.lit(1.0))
        )
        return var / ncell

    have_all = (
        (F.col("_n00") >= 1)
        & (F.col("_n01") >= 1)
        & (F.col("_n10") >= 1)
        & (F.col("_n11") >= 1)
    )
    big_enough = (
        (F.col("_n00") >= 2)
        & (F.col("_n01") >= 2)
        & (F.col("_n10") >= 2)
        & (F.col("_n11") >= 2)
    )
    did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    sev = vterm(0, 0) + vterm(0, 1) + vterm(1, 0) + vterm(1, 1)
    se = F.sqrt(sev)
    return agg.select(
        *by,
        "n",
        F.when(F.col("_n00") >= 1, m(0, 0)).alias("m00"),
        F.when(F.col("_n01") >= 1, m(0, 1)).alias("m01"),
        F.when(F.col("_n10") >= 1, m(1, 0)).alias("m10"),
        F.when(F.col("_n11") >= 1, m(1, 1)).alias("m11"),
        F.when(have_all, did).alias("did"),
        F.when(big_enough & (sev > 0.0), se).alias("se"),
        F.when(big_enough & (sev > 0.0), did / se).alias("t"),
    )


def passing_bablok(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    max_len: int = 1000,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, n_slopes, slope, intercept)`` — Passing-Bablok
    regression (L354): the nonparametric member of the
    method-comparison trio (L316 Bland-Altman, L317 Deming) — no
    error-variance ratio to assume, outlier-proof, scale-invariant:

        S_ij = (y_j − y_i)/(x_j − x_i) over all i < j,
               excluding x_i = x_j and S = −1 exactly;
        K = #{S < −1};  slope = K-SHIFTED median of sorted S
            (odd N: element (N+1)/2 + K;  even N: √(S_{N/2+K} ·
             S_{N/2+1+K}) — NULL if that product ≤ 0);
        intercept = median of (y_i − slope·x_i)   (lower/upper-middle
            AVERAGE on even counts — pinned convention)

    Pair slopes come from the bounded in-row pair lattice (the
    L162/L225 discipline: > ``max_len`` rows per key REFUSED loudly —
    method-comparison designs are hundreds of specimens, not 10⁹);
    (x, y) quantize to DECIMAL(18, scale) so ties and the S = −1 /
    S < −1 classifications are EXACT decimal comparisons, and every
    median pick is a floored-index order statistic.  NULLs refused.

    Scale shape: one keyed collect (bounded by contract) → in-row
    lattice → two order-statistic picks.

    No reference counterpart; method-comparison analytics per SURVEY
    §2.11 (Passing & Bablok 1983).
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(x_col).isNull() | F.col(y_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"passing_bablok: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by,
        F.col(x_col).cast(dec).alias("_x"),
        F.col(y_col).cast(dec).alias("_y"),
    )
    sizes = base.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"passing_bablok: at least one group exceeds max_len="
                f"{max_len} — sample first (the estimator is pairwise; "
                "an unbounded group is quadratic by definition)"
            )
    packed = base.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct("_x", "_y"))).alias("_a")
    )
    e1 = packed.select(*by, "_a", F.posexplode("_a").alias("_i", "_p"))
    e2 = e1.select(
        *by, "_a", "_i", "_p", F.posexplode("_a").alias("_j", "_q")
    )
    pairs = e2.filter(
        (F.col("_i") < F.col("_j"))
        & (F.col("_q._x") != F.col("_p._x"))
    )
    num = (F.col("_q._y") - F.col("_p._y")).cast("double")
    den = (F.col("_q._x") - F.col("_p._x")).cast("double")
    slope = num / den
    # S = -1 exact in decimals: dy == -dx
    not_minus1 = (
        F.col("_q._y") - F.col("_p._y")
        != -(F.col("_q._x") - F.col("_p._x"))
    )
    valid = pairs.filter(not_minus1).select(*by, slope.alias("_s"))
    slopes = valid.groupBy(*by).agg(
        F.sort_array(F.collect_list("_s")).alias("_ss"),
        F.sum((F.col("_s") < F.lit(-1.0)).cast("long")).alias("_k"),
    )
    nn = F.size("_ss")
    kk = F.col("_k")
    odd_pick = F.element_at(
        "_ss", (F.floor((nn + 1) / 2) + kk).cast("int")
    )
    ev_lo = F.element_at("_ss", (F.floor(nn / 2) + kk).cast("int"))
    ev_hi = F.element_at(
        "_ss", (F.floor(nn / 2) + 1 + kk).cast("int")
    )
    b = F.when(nn % 2 == 1, odd_pick).otherwise(
        F.when(ev_lo * ev_hi > 0.0, F.sqrt(ev_lo * ev_hi))
    )
    # guard the shifted index staying in range (pathological K)
    b = F.when(
        (nn > 0)
        & (F.floor(nn / 2) + kk >= F.when(nn % 2 == 1, 0).otherwise(1))
        & (
            F.when(
                nn % 2 == 1, F.floor((nn + 1) / 2) + kk
            ).otherwise(F.floor(nn / 2) + 1 + kk)
            <= nn
        ),
        b,
    )
    slope_df = slopes.select(
        *by, nn.alias("n_slopes"), b.alias("slope")
    )
    with_b = base.join(F.broadcast(slope_df), by).select(
        *by,
        (
            F.col("_y").cast("double")
            - F.col("slope") * F.col("_x").cast("double")
        ).alias("_r"),
    )
    resid = with_b.groupBy(*by).agg(
        F.sort_array(F.collect_list("_r")).alias("_rs"),
        F.count(F.lit(1)).alias("n"),
    )
    m = F.size("_rs")
    r_hi = F.element_at("_rs", (F.floor(m / 2) + 1).cast("int"))
    r_lo = F.element_at("_rs", F.floor((m + 1) / 2).cast("int"))
    a = F.when(m % 2 == 1, r_hi).otherwise(
        (r_lo + r_hi) / F.lit(2.0)
    )
    out = slope_df.join(resid.select(*by, "n", a.alias("_amed")), by)
    return out.select(
        *by,
        "n",
        "n_slopes",
        "slope",
        F.when(F.col("slope").isNotNull(), F.col("_amed")).alias(
            "intercept"
        ),
    )


def wls_regression(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    w_col: str,
    scale: int = 2,
    w_scale: int = 2,
) -> DataFrame:
    """``(by..., n, w_total, slope, intercept, r2)`` — weighted least
    squares (L359): the L135 OLS family when observations carry
    frequency or precision weights (pre-aggregated rows, inverse-
    variance meta-points, sampling weights):

        b = (W·Σwxy − Σwx·Σwy) / (W·Σwx² − (Σwx)²)
        a = (Σwy − b·Σwx)/W
        r² = (W·Σwxy − Σwx·Σwy)² / ((W·Σwx²−(Σwx)²)(W·Σwy²−(Σwy)²))

    Exactness: x, y, w quantize to integer micro-units (the L266
    trick — x·10^scale, w·10^w_scale as DECIMAL(38,0)), so every
    weighted cross-sum is an exact integer; the unit factors cancel
    in b and r², and the intercept divides back out once.  ANSI
    overflow on the (38,0) products fails LOUDLY (never wraps) —
    |q| ≤ 10⁹ supports ~10¹⁹-magnitude sums.  NULLs refused;
    negative weights refused; n < 2 or zero weighted x-variance →
    NULL.

    Scale shape: one combinable agg — one scan, no window.

    No reference counterpart; analytics extension per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(x_col).isNull()
            | F.col(y_col).isNull()
            | F.col(w_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"wls_regression: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        n_neg = df.filter(F.col(w_col) < 0).count()
        if n_neg:
            raise ValueError(
                f"wls_regression: {n_neg} negative weight(s)"
            )
    big = "decimal(38,0)"

    def q(col, s):
        return (
            F.col(col).cast(f"decimal(18,{s})") * F.lit(10**s)
        ).cast(big)

    qx, qy, qw = q(x_col, scale), q(y_col, scale), q(w_col, w_scale)
    staged = df.select(
        *by, qx.alias("_x"), qy.alias("_y"), qw.alias("_w")
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_w").alias("_sw"),
        F.sum(F.col("_w") * F.col("_x")).alias("_swx"),
        F.sum(F.col("_w") * F.col("_y")).alias("_swy"),
        F.sum(F.col("_w") * F.col("_x") * F.col("_x")).alias("_swxx"),
        F.sum(F.col("_w") * F.col("_x") * F.col("_y")).alias("_swxy"),
        F.sum(F.col("_w") * F.col("_y") * F.col("_y")).alias("_swyy"),
    )
    wd = F.col("_sw").cast("double")
    swx = F.col("_swx").cast("double")
    swy = F.col("_swy").cast("double")
    swxx = F.col("_swxx").cast("double")
    swxy = F.col("_swxy").cast("double")
    swyy = F.col("_swyy").cast("double")
    num = wd * swxy - swx * swy
    dx = wd * swxx - swx * swx
    dy = wd * swyy - swy * swy
    b = F.when(dx > 0.0, num / dx)
    a = (swy - b * swx) / wd / F.lit(float(10**scale))
    r2 = F.when(
        (dx > 0.0) & (dy > 0.0), num * num / (dx * dy)
    )
    ok = (F.col("n") >= 2) & (F.col("_sw") > 0)
    return agg.select(
        *by,
        "n",
        (wd / F.lit(float(10**w_scale))).alias("w_total"),
        F.when(ok, b).alias("slope"),
        F.when(ok & b.isNotNull(), a).alias("intercept"),
        F.when(ok, r2).alias("r2"),
    )


def chow_test(
    df: DataFrame,
    by: list[str],
    x: str,
    y: str,
    regime_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., k, n, n_a, n_b, ssr_pooled, ssr_split, f_chow, df2)``
    — Chow structural-break test (L373): did the SAME line generate
    both regimes, or does the relationship shift at a KNOWN break —
    the regression-level counterpart of the mean-level changepoint
    family (L144 Pettitt finds an unknown break in a LEVEL; this
    tests a known break in a SLOPE+INTERCEPT):

        SSR(fit) = (Syy − Sxy²/Sxx)/n-form tree per fit
        F = ((SSR_p − (SSR₁+SSR₂))/2) / ((SSR₁+SSR₂)/(n−4))

    (Chow 1960, k = 2 parameters).  Per regime the exact DECIMAL
    sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) aggregate
    combinably; the pooled statistics are DECIMAL sums of the regime
    sums (exact, order-free), so the pooled fit is bit-identical to a
    direct one-pass fit.  Each SSR and the F are ONE fixed IEEE tree.
    Exactly two regimes required — k ≠ 2, either n_j < 3, zero
    x-variance in any fit, or SSR₁+SSR₂ ≤ 0 → NULL f_chow/df2 (the
    break is undefined, not zero).  df1 = 2 is implied.

    Scale shape: one combinable (keys, regime) groupBy + one k-length
    fold per key — the L367 shape; a 100 TB fact table is scanned
    once and only 6·k-wide rows cross the cluster.

    No reference counterpart; regression diagnostics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    xd = F.col(x).cast(dec)
    yd = F.col(y).cast(dec)
    per = (
        df.filter(
            F.col(x).isNotNull()
            & F.col(y).isNotNull()
            & F.col(regime_col).isNotNull()
        )
        .groupBy(*by, F.col(regime_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(xd).alias("_sx"),
            F.sum(yd).alias("_sy"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(xd * yd).alias("_sxy"),
            F.sum(yd * yd).alias("_syy"),
        )
    )
    arr = per.groupBy(*by).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_n").alias("n"),
        F.sum("_sx").cast("double").alias("_psx"),
        F.sum("_sy").cast("double").alias("_psy"),
        F.sum("_sxx").cast("double").alias("_psxx"),
        F.sum("_sxy").cast("double").alias("_psxy"),
        F.sum("_syy").cast("double").alias("_psyy"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").cast("string").alias("g"),
                    F.col("_n").cast("double").alias("njd"),
                    F.col("_sx").cast("double").alias("sxd"),
                    F.col("_sy").cast("double").alias("syd"),
                    F.col("_sxx").cast("double").alias("sxxd"),
                    F.col("_sxy").cast("double").alias("sxyd"),
                    F.col("_syy").cast("double").alias("syyd"),
                )
            )
        ).alias("_lv"),
    )

    def _ssr(nd, sxd, syd, sxxd, sxyd, syyd):
        cov_n = nd * sxyd - sxd * syd
        varx_n = nd * sxxd - sxd * sxd
        vary_n = nd * syyd - syd * syd
        return (vary_n - cov_n * cov_n / varx_n) / nd

    def _ssr_v(v):
        return _ssr(
            v["njd"], v["sxd"], v["syd"], v["sxxd"], v["sxyd"], v["syyd"]
        )

    def _varx_n(v):
        return v["njd"] * v["sxxd"] - v["sxd"] * v["sxd"]

    nd = F.col("n").cast("double")
    ra = F.try_element_at(F.col("_lv"), F.lit(1))
    rb = F.try_element_at(F.col("_lv"), F.lit(2))
    ssr_p = _ssr(
        nd,
        F.col("_psx"),
        F.col("_psy"),
        F.col("_psxx"),
        F.col("_psxy"),
        F.col("_psyy"),
    )
    ssr_u = _ssr_v(ra) + _ssr_v(rb)
    pooled_varx_n = nd * F.col("_psxx") - F.col("_psx") * F.col("_psx")
    ok = (
        (F.col("k") == 2)
        & (ra["njd"] >= 3.0)
        & (rb["njd"] >= 3.0)
        & (_varx_n(ra) > 0.0)
        & (_varx_n(rb) > 0.0)
        & (pooled_varx_n > 0.0)
    )
    s1 = arr.select(
        *by,
        "k",
        "n",
        F.when(F.col("k") == 2, ra["njd"].cast("bigint")).alias("n_a"),
        F.when(F.col("k") == 2, rb["njd"].cast("bigint")).alias("n_b"),
        F.when(ok, ssr_p).alias("ssr_pooled"),
        F.when(ok, ssr_u).alias("ssr_split"),
        nd.alias("_nd"),
    )
    f_chow = (
        (F.col("ssr_pooled") - F.col("ssr_split")) / F.lit(2.0)
    ) / (F.col("ssr_split") / (F.col("_nd") - F.lit(4.0)))
    return s1.select(
        *by,
        "k",
        "n",
        "n_a",
        "n_b",
        "ssr_pooled",
        "ssr_split",
        F.when(F.col("ssr_split") > 0.0, f_chow).alias("f_chow"),
        F.when(
            F.col("ssr_split") > 0.0, F.col("_nd") - F.lit(4.0)
        ).alias("df2"),
    )


def goldfeld_quandt(
    df: DataFrame,
    by: list[str],
    x: str,
    y: str,
    tiebreak: list[str],
    split_num: int = 3,
    split_den: int = 8,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, m, ssr_low, ssr_high, f_gq, df_side)`` —
    Goldfeld-Quandt heteroskedasticity test (L374): does the residual
    VARIANCE grow with the regressor — the ordered-split companion to
    L270 (Breusch-Pagan regresses squared residuals on x; this fits
    the two x-extreme thirds separately and compares their SSRs):

        rank rows by (x, tiebreak);  m = ⌊n·split⌋ per tail
        F = (SSR_high/(m−2)) / (SSR_low/(m−2))

    (Goldfeld & Quandt 1965; default split 3/8 drops the middle
    quarter).  ``m`` is exact integer arithmetic ``(n·num) div den``;
    each tail folds exact DECIMAL sufficient statistics; each SSR is
    the L373 fixed tree.  ``(x, tiebreak)`` must be a total order per
    key — a tied rank would make the tail membership partition-order
    dependent, so ties are the CALLER's contract (pass a unique id).
    m < 3, zero x-variance in either tail, or SSR_low ≤ 0 → NULL
    f_gq (the ratio is undefined, not zero).

    Scale shape: ONE keyed window exchange (rank + count share the
    partitioning) + one combinable (keys, side) groupBy; the middle
    band never re-crosses the cluster.

    No reference counterpart; regression diagnostics per SURVEY §2.11.
    """
    from pyspark.sql import Window

    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    w = Window.partitionBy(*by).orderBy(x, *tiebreak)
    wc = Window.partitionBy(*by)
    ranked = flt.select(
        *by,
        F.col(x).alias("_x"),
        F.col(y).alias("_y"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    m = F.expr(f"(_cnt * {int(split_num)}) div {int(split_den)}")
    sided = ranked.select(
        *by,
        "_x",
        "_y",
        "_cnt",
        F.when(F.col("_rn") <= m, F.lit("a_low"))
        .when(F.col("_rn") > F.col("_cnt") - m, F.lit("b_high"))
        .alias("_side"),
    ).filter(F.col("_side").isNotNull())
    xd = F.col("_x").cast(dec)
    yd = F.col("_y").cast(dec)
    per = sided.groupBy(*by, "_side").agg(
        F.max("_cnt").alias("_n_all"),
        F.count(F.lit(1)).alias("_m"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(yd * yd).alias("_syy"),
    )
    arr = per.groupBy(*by).agg(
        F.max("_n_all").alias("n"),
        F.min("_m").alias("m"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_side").alias("g"),
                    F.col("_m").cast("double").alias("njd"),
                    F.col("_sx").cast("double").alias("sxd"),
                    F.col("_sy").cast("double").alias("syd"),
                    F.col("_sxx").cast("double").alias("sxxd"),
                    F.col("_sxy").cast("double").alias("sxyd"),
                    F.col("_syy").cast("double").alias("syyd"),
                )
            )
        ).alias("_lv"),
    )

    def _ssr_v(v):
        cov_n = v["njd"] * v["sxyd"] - v["sxd"] * v["syd"]
        varx_n = v["njd"] * v["sxxd"] - v["sxd"] * v["sxd"]
        vary_n = v["njd"] * v["syyd"] - v["syd"] * v["syd"]
        return (vary_n - cov_n * cov_n / varx_n) / v["njd"]

    def _varx_n(v):
        return v["njd"] * v["sxxd"] - v["sxd"] * v["sxd"]

    lo = F.try_element_at(F.col("_lv"), F.lit(1))
    hi = F.try_element_at(F.col("_lv"), F.lit(2))
    md = F.col("m").cast("double")
    ok = (
        (F.size(F.col("_lv")) == 2)
        & (F.col("m") >= 3)
        & (_varx_n(lo) > 0.0)
        & (_varx_n(hi) > 0.0)
    )
    s1 = arr.select(
        *by,
        "n",
        "m",
        F.when(ok, _ssr_v(lo)).alias("ssr_low"),
        F.when(ok, _ssr_v(hi)).alias("ssr_high"),
        md.alias("_md"),
    )
    f_gq = (F.col("ssr_high") / (F.col("_md") - F.lit(2.0))) / (
        F.col("ssr_low") / (F.col("_md") - F.lit(2.0))
    )
    return s1.select(
        *by,
        "n",
        "m",
        "ssr_low",
        "ssr_high",
        F.when(F.col("ssr_low") > 0.0, f_gq).alias("f_gq"),
        F.when(
            F.col("ssr_low") > 0.0, F.col("_md") - F.lit(2.0)
        ).alias("df_side"),
    )


def rdd_sharp(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    cutoff: str,
    bandwidth: str,
    scale: int = 2,
) -> DataFrame:
    """Sharp regression discontinuity (L377): ``(by..., n_below,
    n_above, slope_below, slope_above, limit_below, limit_above,
    tau)`` — the jump-at-a-threshold causal design (treatment assigned
    by x ≥ cutoff: did crossing the line CAUSE a level shift in y):
    fit a separate local line on each side of the cutoff within the
    bandwidth window and read off the two intercepts AT the cutoff,

        τ = lim_{x↓c} ŷ − lim_{x↑c} ŷ = a_above − a_below

    (Thistlethwaite & Campbell 1960; the local-linear form of
    Imbens & Lemieux 2008 §4 with a uniform kernel — the kernel is a
    window, not a weight, so every retained row counts fully and the
    sums stay EXACT).  ``cutoff``/``bandwidth`` are decimal STRINGS
    (the L168 conformal contract — a float threshold would make
    window membership engine-dependent); the centered running
    variable x−c is an exact DECIMAL difference, the window is
    −h ≤ x−c ≤ h inclusive, and the above side is x−c ≥ 0 (treatment
    at the cutoff itself, the sharp-design convention).  Each side's
    fit is the L135 exact-decimal sufficient-statistic OLS; τ is one
    fixed IEEE tree.  A side with n < 2 or zero x-variance yields
    NULL fits (and NULL τ) — a one-point side has no limit.

    Scale shape: the window filter pushes to the scan (100 TB prunes
    to the bandwidth slice), then ONE combinable aggregation with
    per-side conditional sums — the L318 cell shape, no second
    exchange.

    No reference counterpart; causal analytics per SURVEY §2.11."""
    import decimal

    try:
        c_val = decimal.Decimal(cutoff)
        h_val = decimal.Decimal(bandwidth)
    except decimal.InvalidOperation as exc:
        raise ValueError(
            "rdd_sharp: cutoff/bandwidth must be decimal strings"
        ) from exc
    if h_val <= 0:
        raise ValueError("rdd_sharp: bandwidth must be > 0")
    dec = f"decimal(18,{scale})"
    c = F.lit(cutoff).cast(dec)
    h = F.lit(bandwidth).cast(dec)
    xc = F.col(x_col).cast(dec) - c
    flt = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            *by,
            xc.alias("_xc"),
            F.col(y_col).cast(dec).alias("_y"),
        )
        .filter((F.col("_xc") >= -h) & (F.col("_xc") <= h))
    )
    above = F.col("_xc") >= 0

    def _side(tag, cond):
        p = f"_{tag}"
        return [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(
                f"{p}n"
            ),
            F.sum(F.when(cond, F.col("_xc"))).alias(f"{p}sx"),
            F.sum(F.when(cond, F.col("_y"))).alias(f"{p}sy"),
            F.sum(F.when(cond, F.col("_xc") * F.col("_xc"))).alias(
                f"{p}sxx"
            ),
            F.sum(F.when(cond, F.col("_xc") * F.col("_y"))).alias(
                f"{p}sxy"
            ),
        ]

    agg = flt.groupBy(*by).agg(
        *_side("b", ~above), *_side("a", above)
    )

    def _fit(tag):
        p = f"_{tag}"
        n = F.col(f"{p}n").cast("double")
        sx = F.col(f"{p}sx").cast("double")
        sy = F.col(f"{p}sy").cast("double")
        sxx = F.col(f"{p}sxx").cast("double")
        sxy = F.col(f"{p}sxy").cast("double")
        varx_n = n * sxx - sx * sx
        ok = (F.col(f"{p}n") >= 2) & (varx_n > F.lit(0.0))
        slope = F.when(ok, (n * sxy - sx * sy) / varx_n)
        limit = F.when(
            ok, (sy - ((n * sxy - sx * sy) / varx_n) * sx) / n
        )
        return slope, limit

    slope_b, lim_b = _fit("b")
    slope_a, lim_a = _fit("a")
    return agg.select(
        *by,
        F.col("_bn").alias("n_below"),
        F.col("_an").alias("n_above"),
        slope_b.alias("slope_below"),
        slope_a.alias("slope_above"),
        lim_b.alias("limit_below"),
        lim_a.alias("limit_above"),
        (lim_a - lim_b).alias("tau"),
    )


def event_study(
    df: DataFrame,
    by: list[str],
    rel_col: str,
    value_col: str,
    base_period: int = -1,
    scale: int = 4,
) -> DataFrame:
    """Event-study panel (L378): ``(by..., rel_period, n, mean,
    effect, se, t)`` — the dynamic generalization of the L318 2×2:
    instead of one pre/post contrast, the outcome mean at EVERY
    event-relative period is contrasted against the ``base_period``
    (conventionally −1, the last untreated period), tracing out
    pre-trends (the design's falsification check — nonzero effects
    BEFORE the event indict the identification) and the post-event
    dynamic path:

        effect_r = m̄_r − m̄_base
        se_r     = √(s²_r/n_r + s²_base/n_base)      (Welch-style)

    ``rel_col`` is the caller-computed integer event-relative index.
    Per-period sufficient statistics are exact decimals from ONE
    combinable aggregation; the baseline row is broadcast back onto
    the panel (fit-small/apply-small, the L318 discipline), so every
    effect/se/t is one fixed IEEE tree.  The base period's own row
    carries effect = 0 with NULL se/t (self-contrast has no
    sampling distribution); keys with NO base-period rows yield NULL
    effects throughout (the contrast is undefined, loudly visible);
    se is NULL when either side has n < 2.

    Scale shape: one combinable (by, rel) groupBy + a broadcast
    equi-join of the per-key baseline row; 100 TB scanned once.

    No reference counterpart; causal analytics per SURVEY §2.11."""
    from pyspark.sql.functions import broadcast

    dec = f"decimal(18,{scale})"
    vd = F.col(value_col).cast(dec)
    flt = df.filter(
        F.col(rel_col).isNotNull() & F.col(value_col).isNotNull()
    )
    per = flt.groupBy(
        *by, F.col(rel_col).cast("long").alias("rel_period")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).alias("_s"),
        F.sum(vd * vd).alias("_q"),
    )
    base = per.filter(F.col("rel_period") == base_period).select(
        *[F.col(c).alias(f"_b_{c}") for c in by],
        F.col("n").alias("_bn"),
        F.col("_s").alias("_bs"),
        F.col("_q").alias("_bq"),
    )
    if by:
        cond = None
        for c in by:
            term = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
            cond = term if cond is None else (cond & term)
        joined = per.join(broadcast(base), cond, "left")
    else:
        joined = per.join(broadcast(base), F.lit(True), "left")

    def _mean(s, n):
        return s.cast("double") / n.cast("double")

    def _var(s, q, n):
        nd = n.cast("double")
        return (q.cast("double") - s.cast("double") * s.cast("double") / nd) / (
            nd - F.lit(1.0)
        )

    m = _mean(F.col("_s"), F.col("n"))
    mb = _mean(F.col("_bs"), F.col("_bn"))
    is_base = F.col("rel_period") == base_period
    has_base = F.col("_bn").isNotNull()
    eff = F.when(is_base & has_base, F.lit(0.0)).otherwise(
        F.when(has_base, m - mb)
    )
    v = _var(F.col("_s"), F.col("_q"), F.col("n"))
    vb = _var(F.col("_bs"), F.col("_bq"), F.col("_bn"))
    se_ok = (
        has_base
        & ~is_base
        & (F.col("n") >= 2)
        & (F.col("_bn") >= 2)
    )
    se_raw = F.sqrt(
        v / F.col("n").cast("double")
        + vb / F.col("_bn").cast("double")
    )
    se = F.when(se_ok & (se_raw > F.lit(0.0)), se_raw)
    return joined.select(
        *by,
        "rel_period",
        "n",
        m.alias("mean"),
        eff.alias("effect"),
        se.alias("se"),
        F.when(se.isNotNull(), eff / se).alias("t"),
    )


def iv_wald(
    df: DataFrame,
    group_cols: list[str],
    y: str,
    x: str,
    z: str,
    scale: int = 2,
) -> DataFrame:
    """Instrumental-variables / Wald estimator (L405):
    ``(group_cols..., n, beta_iv, alpha_iv, first_stage_slope,
    first_stage_f, reduced_form_slope)`` — the missing member of the
    causal family (DiD L318 needs parallel trends, RDD L377 a
    threshold, event-study L378 clean event timing; IV handles
    endogenous x when an instrument z moves x but touches y ONLY
    through x):

        β_IV = Cov(z,y) / Cov(z,x)          (single-instrument 2SLS
        α_IV = ȳ − β_IV·x̄                    = the Wald/ratio form)

    computed from six exact DECIMAL sufficient statistics (the L135
    discipline — one combinable agg, bit-identical sums), every
    output one fixed IEEE tree.  The first stage is reported next to
    the estimate because an IV without it is malpractice:
    ``first_stage_slope`` = Cov(z,x)/Var(z) and ``first_stage_f`` =
    (n−2)·R₁²/(1−R₁²) with R₁² = Cov(z,x)²/(Var(z)·Var(x)) — the
    weak-instrument number (F < 10 folklore) made visible, plus the
    reduced form Cov(z,y)/Var(z) so β_IV = reduced/first is
    inspectable.  Cov(z,x) = 0 (irrelevant instrument) → NULL β/α —
    the estimator is UNDEFINED there, not infinite.  NULL rows are
    excluded (REGR_* semantics); n < 3 → NULL F.

    No reference counterpart; causal analytics per SURVEY §2.11."""
    dec = f"decimal(18,{scale})"
    yd = F.col(y).cast(dec)
    xd = F.col(x).cast(dec)
    zd = F.col(z).cast(dec)
    stats = (
        df.filter(
            F.col(y).isNotNull()
            & F.col(x).isNotNull()
            & F.col(z).isNotNull()
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(yd).alias("_sy"),
            F.sum(xd).alias("_sx"),
            F.sum(zd).alias("_sz"),
            F.sum(zd * yd).alias("_szy"),
            F.sum(zd * xd).alias("_szx"),
            F.sum(zd * zd).alias("_szz"),
            F.sum(xd * xd).alias("_sxx"),
        )
    )
    n = F.col("n").cast("double")
    sy = F.col("_sy").cast("double")
    sx = F.col("_sx").cast("double")
    sz = F.col("_sz").cast("double")
    szy = F.col("_szy").cast("double")
    szx = F.col("_szx").cast("double")
    szz = F.col("_szz").cast("double")
    sxx = F.col("_sxx").cast("double")
    czy = n * szy - sz * sy
    czx = n * szx - sz * sx
    vz = n * szz - sz * sz
    vx = n * sxx - sx * sx
    beta = F.when(czx != F.lit(0.0), czy / czx)
    alpha = F.when(
        czx != F.lit(0.0), (sy - (czy / czx) * sx) / n
    )
    fs_slope = F.when(vz != F.lit(0.0), czx / vz)
    denom_f = vz * vx - czx * czx
    fs_f = F.when(
        (F.col("n") >= 3) & (vz != F.lit(0.0)) & (denom_f > F.lit(0.0)),
        (n - F.lit(2.0)) * (czx * czx) / denom_f,
    )
    rf_slope = F.when(vz != F.lit(0.0), czy / vz)
    return stats.select(
        *group_cols,
        "n",
        beta.alias("beta_iv"),
        alpha.alias("alpha_iv"),
        fs_slope.alias("first_stage_slope"),
        fs_f.alias("first_stage_f"),
        rf_slope.alias("reduced_form_slope"),
    )
