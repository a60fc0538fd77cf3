"""Experiment effect sizing (L185/L186): Wilson score intervals for
proportions and Cohen's d / Hedges' g for metric differences — the
numbers that turn L139/L140/L178's "is it significant" into "is it
big enough to matter".

L185 — Wilson interval (the proportion CI that behaves at p≈0/1 and
small n, unlike the naive Wald interval):

    center = (p̂ + z²/2n) / (1 + z²/n),
    half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

computed as a FIXED IEEE tree over exact integer (k, n) — p̂ = k/n is
one division, z is a caller literal (1.959963984540054 for 95%) —
bit-identical, ungridded.

L186 — standardized mean difference from the L135 exact-decimal
sufficient statistics: pooled variance via n·Σx² − (Σx)² integers,
d = (m_a − m_b)/s_pooled, Hedges' g = d·(1 − 3/(4(n_a+n_b)−9)) —
fixed trees, one division per factor.

Scale shape: one combinable aggregation each; 100 TB scanned once.

No reference counterpart; experimentation family per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

Z95 = "1.959963984540054"


def wilson_interval(
    df: DataFrame,
    by: list[str],
    success_col: str,
    z: str = Z95,
) -> DataFrame:
    """``(by..., n, k, p, lo, hi)`` — Wilson score interval per group;
    ``success_col`` is 0/1; ``z`` is a decimal-string literal so the
    tree is pinned.  n = 0 → NULLs."""
    s = F.col(success_col).cast("int")
    agg = df.filter(F.col(success_col).isNotNull()).groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("k")
    )
    zd = F.lit(float(z))
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    z2n = zd * zd / nd
    denom = F.lit(1.0) + z2n
    center = (p + z2n / F.lit(2.0)) / denom
    half = (
        zd
        * F.sqrt(p * (F.lit(1.0) - p) / nd + z2n / (F.lit(4.0) * nd))
        / denom
    )
    ok = F.col("n") > 0
    return agg.select(
        *by,
        "n",
        "k",
        F.when(ok, p).alias("p"),
        F.when(ok, F.greatest(center - half, F.lit(0.0))).alias("lo"),
        F.when(ok, F.least(center + half, F.lit(1.0))).alias("hi"),
    )


def cohens_d(
    df: DataFrame,
    by: list[str],
    variant_col: str,
    variant_a: str,
    variant_b: str,
    metric_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_a, n_b, mean_a, mean_b, d, hedges_g)`` — pooled-SD
    standardized mean difference per group (Cohen's d) and the
    small-sample-corrected Hedges' g.  Metrics contract-quantized at
    DECIMAL(18, scale); groups needing n_a+n_b < 3 or zero pooled
    variance → NULL d/g."""
    dec = f"decimal(18,{scale})"
    wide = "decimal(38,6)"
    y = F.col(metric_col).cast(dec)
    flt = df.filter(
        F.col(metric_col).isNotNull()
        & F.col(variant_col).isin([variant_a, variant_b])
    )
    is_a = (F.col(variant_col) == variant_a).cast("int")
    agg = flt.groupBy(*by).agg(
        F.sum(is_a).alias("n_a"),
        F.sum(F.lit(1) - is_a).alias("n_b"),
        F.sum(F.when(is_a == 1, y)).alias("_sa"),
        F.sum(F.when(is_a == 0, y)).alias("_sb"),
        F.sum(F.when(is_a == 1, y.cast(wide) * y.cast(wide))).alias("_ssa"),
        F.sum(F.when(is_a == 0, y.cast(wide) * y.cast(wide))).alias("_ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("_sa").cast("double") / na
    mb = F.col("_sb").cast("double") / nb
    # n·Σx² − (Σx)² exact decimal; SS = that / n (one division each)
    ssa = (
        F.col("n_a").cast(wide) * F.col("_ssa")
        - F.col("_sa").cast(wide) * F.col("_sa").cast(wide)
    ).cast("double") / na
    ssb = (
        F.col("n_b").cast(wide) * F.col("_ssb")
        - F.col("_sb").cast(wide) * F.col("_sb").cast(wide)
    ).cast("double") / nb
    dof = na + nb - F.lit(2.0)
    s_pooled = F.sqrt((ssa + ssb) / dof)
    d = (ma - mb) / s_pooled
    g = d * (
        F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0))
    )
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & ((F.col("n_a") + F.col("n_b")) > 2)
    )
    okv = ok & ((ssa + ssb) > 0.0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, ma).alias("mean_a"),
        F.when(F.col("n_b") > 0, mb).alias("mean_b"),
        F.when(okv, d).alias("d"),
        F.when(okv, g).alias("hedges_g"),
    )


def ratio_metric(
    df: DataFrame,
    by: list[str],
    num_col: str,
    den_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, ratio, se)`` — a ratio metric R = Σx/Σy with its
    DELTA-METHOD standard error over analysis units (Deng, Knoblich &
    Lu 2018 — the experimentation workhorse for per-user ratios like
    revenue/session where naive row-level variance is wrong because
    the denominator is random too):

        R      = Σx / Σy
        var(R) = (s_x² + R²·s_y² − 2R·s_xy) / (n·ȳ²)

    with unit-level sample (co)variances from EXACT DECIMAL sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy — the L135/L139 discipline)
    and then one fixed IEEE tree: bit-identical, ungridded.  n < 2 or
    Σy = 0 yields NULL ratio/se; a negative variance estimate (the
    delta approximation can go below 0 in degenerate corners) yields
    NULL se rather than a NaN sqrt.

    Scale shape: ONE combinable groupBy over the unit table; 100 TB
    scans once."""
    dec = f"decimal(18,{scale})"
    xd = F.col(num_col).cast(dec)
    yd = F.col(den_col).cast(dec)
    agg = (
        df.filter(F.col(num_col).isNotNull() & F.col(den_col).isNotNull())
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
    r = sx / sy
    ybar = sy / nd
    vx = (nd * sxx - sx * sx) / (nd * (nd - F.lit(1.0)))
    vy = (nd * syy - sy * sy) / (nd * (nd - F.lit(1.0)))
    cxy = (nd * sxy - sx * sy) / (nd * (nd - F.lit(1.0)))
    var = (vx + r * r * vy - F.lit(2.0) * r * cxy) / (nd * ybar * ybar)
    ok = (F.col("n") > 1) & (F.col("_sy") != F.lit(0).cast(dec))
    return agg.select(
        *by,
        "n",
        F.when(ok, r).alias("ratio"),
        F.when(ok & (var >= 0), F.sqrt(var)).alias("se"),
    )


# standard normal quantiles, embedded as literals so both engines fold
# the same doubles (no cross-engine erfinv).  z_{0.975} REUSES the
# module's Z95 literal (one double for one quantile — a second
# near-identical constant would break bit-identity between operators
# sharing it); z_{0.80} for 80% power.
_Z_ALPHA_005 = float(Z95)
_Z_POWER_080 = 0.8416212335729143


def mde_proportions(
    df: DataFrame,
    by: list[str],
    label_col: str,
    z_alpha: float = _Z_ALPHA_005,
    z_power: float = _Z_POWER_080,
) -> DataFrame:
    """``(by..., n, k, p, mde_abs, mde_rel)`` — the minimum detectable
    effect of a two-arm proportion test at the observed base rate and
    sample size (the experiment-PLANNING companion to Welch/SRM/Wilson:
    "with this much traffic per arm, what lift could we even see?"),
    using the standard equal-n normal approximation:

        mde_abs = (z_α/2 + z_β) · sqrt(2·p̂(1−p̂)/n)
        mde_rel = mde_abs / p̂

    p̂ = k/n from exact integer counts; the z quantiles are embedded
    double literals (defaults: two-sided α = 0.05, power = 0.80 —
    overridable, but pass LITERALS, not engine erfinv calls) so the
    whole statistic is one fixed IEEE tree — bit-identical,
    ungridded.  Degenerate base rates (k = 0 or k = n) yield NULL
    mde (the normal approximation is meaningless there); n = 0
    groups are absent.

    Scale shape: ONE combinable groupBy; 100 TB scans once."""
    from .validate import assert_binary

    lab = F.col(label_col).cast("int")
    flt = df.filter(F.col(label_col).isNotNull())
    assert_binary(flt, label_col, "mde_proportions")
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"), F.sum(lab).alias("k")
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    mde = F.lit(float(z_alpha) + float(z_power)) * F.sqrt(
        F.lit(2.0) * p * (F.lit(1.0) - p) / nd
    )
    ok = (F.col("k") > 0) & (F.col("k") < F.col("n"))
    return agg.select(
        *by,
        "n",
        "k",
        p.alias("p"),
        F.when(ok, mde).alias("mde_abs"),
        F.when(ok, mde / p).alias("mde_rel"),
    )


def covariate_balance(
    df: DataFrame,
    by: list[str],
    treat_col: str,
    metric_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_t, n_c, mean_t, mean_c, smd)`` — the standardized
    mean difference, the covariate-balance diagnostic of causal
    inference / experiment health (|SMD| < 0.1 is the conventional
    "balanced" bar — Austin 2011): per group,

        smd = (m_t − m_c) / sqrt((v_t + v_c)/2)

    with means and sample variances from EXACT DECIMAL sufficient
    statistics per arm (the L135/L139 discipline) and one fixed IEEE
    tree — bit-identical, ungridded.  Unlike Cohen's d (L186) the
    denominator is the UNPOOLED average variance — the standard SMD
    convention, insensitive to arm imbalance.  ``treat_col`` must be
    0/1 (refused otherwise); arms with n < 2 or a zero denominator
    yield NULL smd.

    Scale shape: ONE combinable groupBy with conditional sums; 100 TB
    scans once."""
    dec = f"decimal(18,{scale})"
    from .validate import assert_binary

    t = F.col(treat_col).cast("int")
    flt = df.filter(
        F.col(treat_col).isNotNull() & F.col(metric_col).isNotNull()
    )
    assert_binary(flt, treat_col, "covariate_balance")
    yd = F.col(metric_col).cast(dec)

    def _arm(tag, cond):
        return [
            F.sum(cond.cast("long")).alias(f"n_{tag}"),
            F.sum(F.when(cond, yd)).alias(f"s_{tag}"),
            F.sum(F.when(cond, yd * yd)).alias(f"sxx_{tag}"),
        ]

    agg = flt.groupBy(*by).agg(
        *_arm("t", t == 1), *_arm("c", t == 0)
    )

    def _stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        mean = s / n
        var = (n * sxx - s * s) / (n * (n - F.lit(1.0)))
        return n, mean, var

    nt, mt, vt = _stats("t")
    nc, mc, vc = _stats("c")
    den = F.sqrt((vt + vc) / F.lit(2.0))
    ok = (
        (F.col("n_t") > 1)
        & (F.col("n_c") > 1)
        & (vt + vc > F.lit(0.0))
    )
    return agg.select(
        *by,
        "n_t",
        "n_c",
        F.when(F.col("n_t") > 0, mt).alias("mean_t"),
        F.when(F.col("n_c") > 0, mc).alias("mean_c"),
        F.when(ok, (mt - mc) / den).alias("smd"),
    )


def bh_fdr(
    df: DataFrame,
    test_col: str,
    p_col: str,
    q: str = "0.05",
    max_tests: int = 10_000_000,
) -> DataFrame:
    """``(test, p, rank, m, threshold, discovery)`` — the
    Benjamini-Hochberg step-up procedure over a table of test
    p-values (the multiple-testing closer for the L139/L146/L174
    family when hundreds of metrics/segments are tested at once):
    sort p ascending (ties broken by test id — deterministic), find
    the largest k with p_(k) ≤ k·q/m, and flag ranks ≤ k.

    ``q`` is a decimal STRING; each row's threshold k·q/m is ONE IEEE
    division of the exact decimal k·q by the exact integer m, and the
    p ≤ threshold comparison runs on identical doubles in both
    engines — bit-identical flags.  The input is a RESULTS table (one
    row per hypothesis), but nothing structurally bounds it, and the
    step-up rank sweep is one global ordering window — so more than
    ``max_tests`` hypotheses are refused loudly (r5 VERDICT item 7;
    the survival.py max_points discipline) instead of silently
    funnelling a fact-scale table through one task.  Out-of-range q or
    p-values are refused loudly; both input checks ride ONE validation
    scan."""
    import decimal

    try:
        q_val = decimal.Decimal(q)
    except decimal.InvalidOperation as exc:
        raise ValueError(f"bh_fdr: unparseable q {q!r}") from exc
    if not 0 < q_val < 1:
        raise ValueError(f"bh_fdr: q must be in (0,1), got {q!r}")
    if q_val != q_val.quantize(decimal.Decimal("0.000001")):
        raise ValueError(
            f"bh_fdr: q {q!r} has more than 6 decimal places — the "
            "threshold arithmetic runs at DECIMAL(9,6); rounding it "
            "silently would test a different FDR than requested"
        )
    flt = df.filter(F.col(p_col).isNotNull())
    if validation_enabled():
        chk = flt.agg(
            F.sum(((F.col(p_col) < 0) | (F.col(p_col) > 1)).cast("long")).alias("n_bad"),
            F.count(F.lit(1)).alias("m"),
        ).collect()[0]
        if chk["n_bad"]:
            raise ValueError(
                f"bh_fdr: {chk['n_bad']} p-value(s) outside [0,1] — fix the "
                "upstream test"
            )
        if chk["m"] > max_tests:
            raise ValueError(
                f"bh_fdr: {chk['m']} hypotheses exceed max_tests="
                f"{max_tests} — the rank sweep is one global window; "
                "raise the cap deliberately or shard the test table"
            )
    w = Window.orderBy(F.col(p_col).asc(), F.col(test_col).asc())
    tot = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = flt.select(
        F.col(test_col).alias("test"),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(tot).alias("m"),
    )
    thr = (
        F.col("rank").cast("decimal(20,0)") * F.lit(q).cast("decimal(9,6)")
    ).cast("double") / F.col("m").cast("double")
    staged = ranked.withColumn("threshold", thr).withColumn(
        "_hit", F.when(F.col("p") <= F.col("threshold"), F.col("rank"))
    )
    kmax = staged.select(
        F.coalesce(F.max("_hit"), F.lit(0)).alias("_k")
    )
    return (
        staged.crossJoin(F.broadcast(kmax))
        .select(
            "test",
            "p",
            "rank",
            "m",
            "threshold",
            (F.col("rank") <= F.col("_k")).alias("discovery"),
        )
    )


def two_proportion_test(
    df: DataFrame,
    by: list[str],
    variant_col: str,
    variant_a: str,
    variant_b: str,
    label_col: str,
) -> DataFrame:
    """``(by..., n_a, k_a, n_b, k_b, z, risk_ratio, rr_se_log,
    odds_ratio, or_se_log)`` — the binary-metric A/B scoreboard: the
    pooled two-proportion z-test plus the Katz log-scale standard
    errors for the risk ratio and odds ratio (the effect sizes a lift
    report actually quotes; pair ±1.96·se_log with exp() at the
    caller):

        z  = (p̂_a − p̂_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ pooled
        rr = (k_a/n_a)/(k_b/n_b)         se_log_rr = sqrt(1/k_a −
             1/n_a + 1/k_b − 1/n_b)
        or = (k_a(n_b−k_b))/(k_b(n_a−k_a))  se_log_or = sqrt(1/k_a +
             1/(n_a−k_a) + 1/k_b + 1/(n_b−k_b))

    — exact integer counts, fixed IEEE trees (log/exp never taken
    here, so no transcendental at all).  Degenerate cells (zero or
    full counts where a formula divides by them) yield NULL for the
    affected statistics only.  Non-binary labels refused.

    Scale shape: one combinable groupBy with conditional sums; 100 TB
    scans once."""
    from .validate import assert_binary

    lab = F.col(label_col).cast("int")
    flt = df.filter(
        F.col(label_col).isNotNull()
        & F.col(variant_col).isin([variant_a, variant_b])
    )
    assert_binary(flt, label_col, "two_proportion_test")
    is_a = F.col(variant_col) == variant_a
    agg = flt.groupBy(*by).agg(
        F.sum(is_a.cast("long")).alias("n_a"),
        F.coalesce(F.sum(F.when(is_a, lab)), F.lit(0)).alias("k_a"),
        F.sum((~is_a).cast("long")).alias("n_b"),
        F.coalesce(F.sum(F.when(~is_a, lab)), F.lit(0)).alias("k_b"),
    )
    na = F.col("n_a").cast("double")
    ka = F.col("k_a").cast("double")
    nb = F.col("n_b").cast("double")
    kb = F.col("k_b").cast("double")
    p_pool = (ka + kb) / (na + nb)
    se = F.sqrt(
        p_pool * (F.lit(1.0) - p_pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = (ka / na - kb / nb) / se
    ok_z = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("k_a") + F.col("k_b") > 0)
        & (F.col("k_a") + F.col("k_b") < F.col("n_a") + F.col("n_b"))
    )
    rr = (ka / na) / (kb / nb)
    rr_se = F.sqrt(
        F.lit(1.0) / ka - F.lit(1.0) / na + F.lit(1.0) / kb - F.lit(1.0) / nb
    )
    ok_rr = (F.col("k_a") > 0) & (F.col("k_b") > 0) & (F.col("n_a") > 0) & (
        F.col("n_b") > 0
    )
    orat = (ka * (nb - kb)) / (kb * (na - ka))
    or_se = F.sqrt(
        F.lit(1.0) / ka
        + F.lit(1.0) / (na - ka)
        + F.lit(1.0) / kb
        + F.lit(1.0) / (nb - kb)
    )
    ok_or = (
        (F.col("k_a") > 0)
        & (F.col("k_b") > 0)
        & (F.col("k_a") < F.col("n_a"))
        & (F.col("k_b") < F.col("n_b"))
    )
    return agg.select(
        *by,
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        F.when(ok_z, z).alias("z"),
        F.when(ok_rr, rr).alias("risk_ratio"),
        F.when(ok_rr, rr_se).alias("rr_se_log"),
        F.when(ok_or, orat).alias("odds_ratio"),
        F.when(ok_or, or_se).alias("or_se_log"),
    )


def msprt_normal(
    df: DataFrame,
    by: list[str],
    group_col: str,
    variant_a: str,
    variant_b: str,
    value_col: str,
    tau: float = 1.0,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_a, n_b, delta, v, lam, p_always_valid)`` — the
    mixture sequential probability ratio test (L283, Johari et al.
    2017 "Peeking at A/B tests"): the ALWAYS-VALID p-value that stays
    correct no matter how often the experimenter peeks — the fix for
    the peeking problem that invalidates the fixed-horizon Welch test
    (L139) under continuous monitoring:

        Λ = sqrt(V/(V + τ²)) · exp(δ²·τ² / (2·V·(V + τ²)))
        p_av = min(1, 1/Λ)

    with δ the difference of variant means, V its estimated variance
    (pooled sample variance · (1/n_a + 1/n_b)), and τ² the mixture
    prior over effect sizes (a fixed analysis parameter, NOT data).
    All sufficient statistics are EXACT DECIMAL (the L139
    discipline); Λ is one fixed IEEE tree (exp is the libm
    reliance).  n < 2 either side, or zero pooled variance → NULL.

    Scale shape: ONE combinable aggregation over the fact table.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    if not tau > 0:
        raise ValueError("msprt_normal: tau must be > 0")
    dec = f"decimal(18,{scale})"
    xd = F.col(value_col).cast(dec)
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([variant_a, variant_b])
    )
    is_a = (F.col(group_col) == variant_a).cast("int")
    agg = flt.groupBy(*by).agg(
        F.sum(is_a).alias("n_a"),
        F.sum(F.lit(1) - is_a).alias("n_b"),
        F.sum(F.when(is_a == 1, xd)).alias("_sa"),
        F.sum(F.when(is_a == 0, xd)).alias("_sb"),
        F.sum(F.when(is_a == 1, xd * xd)).alias("_qa"),
        F.sum(F.when(is_a == 0, xd * xd)).alias("_qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("_sa").cast("double")
    sb = F.col("_sb").cast("double")
    qa = F.col("_qa").cast("double")
    qb = F.col("_qb").cast("double")
    delta = sa / na - sb / nb
    ssq = (qa - sa * sa / na) + (qb - sb * sb / nb)
    s2 = ssq / (na + nb - F.lit(2.0))
    v = s2 * (F.lit(1.0) / na + F.lit(1.0) / nb)
    t2 = F.lit(float(tau) * float(tau))
    lam = F.sqrt(v / (v + t2)) * F.exp(
        delta * delta * t2 / (F.lit(2.0) * v * (v + t2))
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (v > 0.0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), delta
        ).alias("delta"),
        F.when(ok, v).alias("v"),
        F.when(ok, lam).alias("lam"),
        F.when(ok, F.least(F.lit(1.0), F.lit(1.0) / lam)).alias(
            "p_always_valid"
        ),
    )


def meta_pool(
    df: DataFrame,
    by: list[str],
    effect_col: str,
    se_col: str,
    max_groups: int = 100_000,
) -> DataFrame:
    """``(by..., k, effect_fixed, se_fixed, q, i2, tau2,
    effect_random, se_random)`` — inverse-variance meta-analysis
    pooling (L293): combine per-segment effect estimates (per-market
    A/B deltas, per-cohort lifts) into one pooled effect, quantify
    heterogeneity, and re-pool under the DerSimonian-Laird
    random-effects model when segments genuinely differ:

        fixed:   ŷ_F = Σwᵢyᵢ/Σwᵢ,  se_F = √(1/Σw),  wᵢ = 1/seᵢ²
        Q = Σwᵢ(yᵢ − ŷ_F)²,  I² = max(0, (Q − (k−1))/Q)
        τ²_DL = max(0, (Q − (k−1)) / (Σw − Σw²/Σw))
        random: w*ᵢ = 1/(seᵢ² + τ²), same pooling

    Each Σ is an order-pinned LEFT FOLD over the BOUNDED sorted
    segment list (weights are floats; a plain SUM would be
    order-sensitive) — the staged selects pin one fixed tree
    end-to-end.  Nonpositive SEs refused; k < 2 → NULL q/i2/tau2;
    Q = 0 or a zero DL denominator → τ² = 0 (fixed = random).

    Scale shape: one (keys) groupBy packing the bounded segment list
    + in-array folds — the input is already aggregate-sized.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(effect_col).isNotNull() & F.col(se_col).isNotNull()
    )
    if validation_enabled():
        bad = flt.filter(F.col(se_col) <= 0).count()
        if bad:
            raise ValueError(f"meta_pool: {bad} nonpositive SE(s)")
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_groups).count()
        if over:
            raise ValueError(
                f"meta_pool: a group exceeds max_groups={max_groups}"
            )
    packed = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(effect_col).cast("double").alias("y"),
                    F.col(se_col).cast("double").alias("se"),
                )
            )
        ).alias("_lv"),
    )

    def _fold(term):
        return F.aggregate(
            F.col("_lv"), F.lit(0.0), lambda a, e: a + term(e)
        )

    w = lambda e: F.lit(1.0) / (e["se"] * e["se"])
    s1 = packed.select(
        *by,
        "k",
        "_lv",
        _fold(w).alias("_sw"),
        _fold(lambda e: w(e) * e["y"]).alias("_swy"),
        _fold(lambda e: w(e) * w(e)).alias("_sww"),
    )
    yf = F.col("_swy") / F.col("_sw")
    s2 = s1.select(*by, "k", "_lv", "_sw", "_sww", yf.alias("_yf"))
    q = _fold(
        lambda e: w(e)
        * (e["y"] - F.col("_yf"))
        * (e["y"] - F.col("_yf"))
    )
    s3 = s2.select(*by, "k", "_lv", "_sw", "_sww", "_yf", q.alias("_q"))
    kd = F.col("k").cast("double")
    dl_den = F.col("_sw") - F.col("_sww") / F.col("_sw")
    tau2 = F.when(
        (F.col("k") >= 2) & (dl_den > 0.0),
        F.greatest(
            F.lit(0.0),
            (F.col("_q") - (kd - F.lit(1.0))) / dl_den,
        ),
    ).otherwise(F.lit(0.0))
    s4 = s3.select(
        *by, "k", "_lv", "_sw", "_yf", "_q", tau2.alias("_tau2")
    )
    ws = lambda e: F.lit(1.0) / (
        e["se"] * e["se"] + F.col("_tau2")
    )
    s5 = s4.select(
        *by,
        "k",
        "_sw",
        "_yf",
        "_q",
        "_tau2",
        _fold(ws).alias("_swr"),
        _fold(lambda e: ws(e) * e["y"]).alias("_swry"),
    )
    i2 = F.greatest(
        F.lit(0.0),
        (F.col("_q") - (kd - F.lit(1.0))) / F.col("_q"),
    )
    ok_het = (F.col("k") >= 2) & (F.col("_q") > 0.0)
    return s5.select(
        *by,
        "k",
        F.col("_yf").alias("effect_fixed"),
        F.sqrt(F.lit(1.0) / F.col("_sw")).alias("se_fixed"),
        F.when(F.col("k") >= 2, F.col("_q")).alias("q"),
        F.when(ok_het, i2).alias("i2"),
        F.when(F.col("k") >= 2, F.col("_tau2")).alias("tau2"),
        (F.col("_swry") / F.col("_swr")).alias("effect_random"),
        F.sqrt(F.lit(1.0) / F.col("_swr")).alias("se_random"),
    )


def mix_shift_decomposition(
    df: DataFrame,
    by: list[str],
    segment_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    succ_col: str,
    trial_col: str,
    max_segments: int = 100_000,
) -> DataFrame:
    """``(by..., n_segments, rate_a, rate_b, delta, rate_effect,
    mix_effect)`` — the Kitagawa/Oaxaca mix-shift decomposition
    (L319): WHY did the aggregate rate move between two populations —
    because per-segment rates changed, or because the traffic MIX
    shifted toward different segments (the Simpson's-paradox
    post-mortem, L141's audit quantified):

        Δ = R_A − R_B = Σ_s w̄_s·(r_As − r_Bs)   [rate effect]
                      + Σ_s r̄_s·(w_As − w_Bs)   [mix effect]

    with w = segment trial share, r = segment rate, and bars the
    two-population means — an exact algebraic identity (pinned by
    test).  Segment cells are exact integer sums; the folds run over
    the bounded sorted segment list (``max_segments`` refused
    beyond).  Segments present on only ONE side are REFUSED loudly —
    the midpoint convention is a modelling choice the caller must
    make explicitly (coalesce segments first).

    Scale shape: one combinable (keys, segment, group) cell agg + one
    bounded fold — one scan of 100 TB.

    No reference counterpart; metric-forensics analytics per SURVEY
    §2.11.
    """
    flt = df.filter(
        F.col(segment_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
        & F.col(succ_col).isNotNull()
        & F.col(trial_col).isNotNull()
    )
    cells = flt.groupBy(
        *by,
        F.col(segment_col).alias("_seg"),
        F.col(group_col).alias("_g"),
    ).agg(
        F.sum(succ_col).alias("_s"), F.sum(trial_col).alias("_t")
    )
    wide = cells.groupBy(*by, "_seg").agg(
        F.sum(F.when(F.col("_g") == group_a, F.col("_s"))).alias("_sa"),
        F.sum(F.when(F.col("_g") == group_a, F.col("_t"))).alias("_ta"),
        F.sum(F.when(F.col("_g") == group_b, F.col("_s"))).alias("_sb"),
        F.sum(F.when(F.col("_g") == group_b, F.col("_t"))).alias("_tb"),
    )
    if validation_enabled():
        n_onesided = wide.filter(
            F.col("_ta").isNull() | F.col("_tb").isNull()
        ).count()
        if n_onesided:
            raise ValueError(
                f"mix_shift_decomposition: {n_onesided} segment(s) "
                "present on only one side — coalesce segments first"
            )
    sizes = wide.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_segments).count()
        if over:
            raise ValueError(
                "mix_shift_decomposition: a group exceeds "
                f"max_segments={max_segments}"
            )
    packed = wide.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("_sa").alias("_tsa"),
        F.sum("_ta").alias("_tta"),
        F.sum("_sb").alias("_tsb"),
        F.sum("_tb").alias("_ttb"),
        F.sort_array(
            F.collect_list(F.struct("_seg", "_sa", "_ta", "_sb", "_tb"))
        ).alias("_lv"),
    )
    tta = F.col("_tta").cast("double")
    ttb = F.col("_ttb").cast("double")

    def _fold(term):
        return F.aggregate(
            F.col("_lv"), F.lit(0.0), lambda a, e: a + term(e)
        )

    ra = lambda e: e["_sa"].cast("double") / e["_ta"].cast("double")
    rb = lambda e: e["_sb"].cast("double") / e["_tb"].cast("double")
    wa = lambda e: e["_ta"].cast("double") / tta
    wb = lambda e: e["_tb"].cast("double") / ttb
    rate_eff = _fold(
        lambda e: (wa(e) + wb(e)) / F.lit(2.0) * (ra(e) - rb(e))
    )
    mix_eff = _fold(
        lambda e: (ra(e) + rb(e)) / F.lit(2.0) * (wa(e) - wb(e))
    )
    rate_a = F.col("_tsa").cast("double") / tta
    rate_b = F.col("_tsb").cast("double") / ttb
    ok = (F.col("_tta") > 0) & (F.col("_ttb") > 0)
    return packed.select(
        *by,
        "n_segments",
        F.when(ok, rate_a).alias("rate_a"),
        F.when(ok, rate_b).alias("rate_b"),
        F.when(ok, rate_a - rate_b).alias("delta"),
        F.when(ok, rate_eff).alias("rate_effect"),
        F.when(ok, mix_eff).alias("mix_effect"),
    )


def direct_standardization(
    df: DataFrame,
    by: list[str],
    stratum_col: str,
    group_col: str,
    succ_col: str,
    trial_col: str,
    max_strata: int = 100_000,
) -> DataFrame:
    """``(by..., group, n_trials, crude_rate, std_rate)`` — directly
    standardized rates (L329): compare group rates AS IF every group
    had the POOLED stratum mix — the apples-to-apples rate the crude
    rate is not when groups differ in composition (the estimator
    companion to the L319 decomposition, which explains the gap this
    one removes):

        std_rate_g = Σ_s W_s·r_gs,   W_s = pooled stratum share

    Cells are exact integer sums; the per-group fold runs over the
    bounded sorted stratum list (refused beyond ``max_strata``).
    A stratum a group never saw contributes its weight at rate NULL →
    the group's std_rate is NULL (the honest answer — refusing to
    invent a rate; restrict strata first if that bites).

    Scale shape: one combinable (keys, stratum, group) cell agg + one
    bounded fold per group — one scan of 100 TB.

    No reference counterpart; metric-forensics analytics per SURVEY
    §2.11.
    """
    flt = df.filter(
        F.col(stratum_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(succ_col).isNotNull()
        & F.col(trial_col).isNotNull()
    )
    cells = flt.groupBy(
        *by,
        F.col(stratum_col).alias("_s"),
        F.col(group_col).alias("group"),
    ).agg(
        F.sum(succ_col).alias("_x"), F.sum(trial_col).alias("_t")
    )
    strata = cells.groupBy(*by, "_s").agg(
        F.sum("_t").alias("_st")
    )
    tot = strata.groupBy(*by).agg(F.sum("_st").alias("_tt"))
    sizes = strata.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_strata).count()
        if over:
            raise ValueError(
                f"direct_standardization: a group exceeds "
                f"max_strata={max_strata}"
            )
    wtd = cells.join(strata, [*by, "_s"])
    wtd = (
        wtd.join(tot, by) if by else wtd.crossJoin(tot)
    )
    packed = wtd.groupBy(*by, "group").agg(
        F.sum("_t").alias("n_trials"),
        F.sum("_x").alias("_nx"),
        F.sort_array(
            F.collect_list(F.struct("_s", "_x", "_t", "_st", "_tt"))
        ).alias("_lv"),
    )
    crude = F.col("_nx").cast("double") / F.col("n_trials").cast(
        "double"
    )
    std = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (e["_st"].cast("double") / e["_tt"].cast("double"))
        * (e["_x"].cast("double") / e["_t"].cast("double")),
    )
    # a group missing some stratum: its fold covers only seen strata;
    # detect by comparing covered weight to 1
    covered = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + e["_st"].cast("double") / e["_tt"].cast("double"),
    )
    full = F.abs(covered - F.lit(1.0)) < F.lit(1e-12)
    return packed.select(
        *by,
        "group",
        "n_trials",
        F.when(F.col("n_trials") > 0, crude).alias("crude_rate"),
        F.when(full, std).alias("std_rate"),
    )


def pvalue_adjust(
    df: DataFrame,
    test_col: str,
    p_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """``(by..., test, p, rank, m, p_bonferroni, p_holm,
    p_hochberg)`` — the family-wise-error adjustment panel (L355),
    the FWER companions to L211's FDR: what a p-value must become
    when it is one of m looks, under the three standard step rules:

        Bonferroni:  min(1, m·p)
        Holm (step-down):   min(1, cummax_{j≤i} (m−j+1)·p₍ⱼ₎)
        Hochberg (step-up): min(1, cummin_{j≥i} (m−j+1)·p₍ⱼ₎)

    (ranks by p ascending, ties broken by test id — deterministic;
    the R ``p.adjust`` conventions exactly).  Every raw term is ONE
    per-row IEEE multiply, and the running envelopes are MAX/MIN
    windows — order-statistic aggregations with no accumulation
    error, so the whole panel is bit-identical across engines.  The
    input is a RESULTS table (one row per hypothesis — bounded by
    construction).  p outside [0,1] refused loudly.

    Scale shape: one bounded ordering window per family.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    by = list(by or [])
    flt = df.filter(F.col(p_col).isNotNull())
    if validation_enabled():
        n_bad = flt.filter(
            (F.col(p_col) < 0) | (F.col(p_col) > 1)
        ).count()
        if n_bad:
            raise ValueError(
                f"pvalue_adjust: {n_bad} p-value(s) outside [0,1] — fix "
                "the upstream test"
            )
    w = Window.partitionBy(*by).orderBy(
        F.col(p_col).asc(), F.col(test_col).asc()
    )
    tot = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = flt.select(
        *by,
        F.col(test_col).alias("test"),
        F.col(p_col).cast("double").alias("p"),
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(tot).alias("m"),
    )
    raw = (
        (F.col("m") - F.col("rank") + F.lit(1)).cast("double")
        * F.col("p")
    )
    staged = ranked.select(*by, "test", "p", "rank", "m", raw.alias("_raw"))
    w_up = Window.partitionBy(*by).orderBy(F.col("rank").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_down = Window.partitionBy(*by).orderBy(
        F.col("rank").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    one = F.lit(1.0)
    md = F.col("m").cast("double")
    return staged.select(
        *by,
        "test",
        "p",
        "rank",
        "m",
        F.least(one, md * F.col("p")).alias("p_bonferroni"),
        F.least(one, F.max("_raw").over(w_up)).alias("p_holm"),
        F.least(one, F.min("_raw").over(w_down)).alias("p_hochberg"),
    )


def poisson_rate_ci(
    df: DataFrame,
    by: list[str],
    events_col: str,
    exposure_col: str,
    z: float = 1.96,
    scale: int = 4,
) -> DataFrame:
    """``(by..., events, exposure, rate, rate_lo, rate_hi)`` — Poisson
    rate with Byar's confidence interval (L360): incidents per
    exposure (errors per machine-hour, infections per person-year)
    with the approximation that stays honest at SMALL counts where
    the Wald ±z√(X)/T interval collapses:

        lo = X·(1 − 1/(9X) − z/(3√X))³ / T
        hi = (X+1)·(1 − 1/(9(X+1)) + z/(3√(X+1)))³ / T

    (Byar's cube-root normal approximation — within ~1% of exact
    Poisson limits even at X = 2; X = 0 pins lo = 0.)  Event and
    exposure totals are exact (integer counts; DECIMAL(18, scale)
    exposures); the interval is one fixed IEEE tree with cubes spelled
    d·d·d (no libm pow).  Negative events/exposures refused; zero
    total exposure → NULL panel.

    Scale shape: one combinable agg — one scan, no window.

    No reference counterpart; the count-data companion to L185's
    Wilson interval per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(events_col).isNull() | F.col(exposure_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"poisson_rate_ci: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        n_neg = df.filter(
            (F.col(events_col) < 0) | (F.col(exposure_col) < 0)
        ).count()
        if n_neg:
            raise ValueError(
                f"poisson_rate_ci: {n_neg} negative value(s)"
            )
    dec = f"decimal(18,{scale})"
    agg = df.groupBy(*by).agg(
        F.sum(F.col(events_col).cast("long")).alias("events"),
        F.sum(F.col(exposure_col).cast(dec)).alias("_t"),
    )
    xd = F.col("events").cast("double")
    td = F.col("_t").cast("double")
    zl = F.lit(float(z))
    one, nine, three = F.lit(1.0), F.lit(9.0), F.lit(3.0)
    xp = xd + one
    lo_core = one - one / (nine * xd) - zl / (three * F.sqrt(xd))
    hi_core = one - one / (nine * xp) + zl / (three * F.sqrt(xp))
    lo = F.when(F.col("events") > 0,
                xd * (lo_core * lo_core * lo_core) / td).otherwise(
        F.lit(0.0)
    )
    hi = xp * (hi_core * hi_core * hi_core) / td
    ok = F.col("_t") > 0
    return agg.select(
        *by,
        "events",
        td.alias("exposure"),
        F.when(ok, xd / td).alias("rate"),
        F.when(ok, lo).alias("rate_lo"),
        F.when(ok, hi).alias("rate_hi"),
    )


def cliffs_delta(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, gt_pairs, lt_pairs, tie_pairs, delta,
    a_measure)`` — Cliff's delta + Vargha-Delaney A (L366): the
    ordinal effect sizes that answer "how OFTEN is a draw from A
    bigger than a draw from B" — the robust companion to Cohen's d
    (L186, which assumes interval scale and is wrecked by outliers)
    and the size half of the Brunner-Munzel test (L268):

        delta = (#{a>b} - #{a<b}) / (n_a*n_b)      in [-1, 1]
        A     = (#{a>b} + #{a=b}/2) / (n_a*n_b)    in [0, 1]
                (A = (delta+1)/2; both published for convention-free
                 reading: |delta| 0.147/0.33/0.474 small/medium/large)

    The n_a*n_b pair space is never materialized: values collapse to
    per-value cells (ca, cb) and #{a>b} = SUM ca * cum_cb_below from
    ONE ascending-value window — every pair count an exact
    DECIMAL(38,0) integer (order-insensitive sums, no fold needed),
    then one division each.  Empty sides yield NULL delta/A.

    Scale shape: one (keys, value) groupBy + one window over the
    bounded value grid + one combinable agg — one scan of 100 TB.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    cells = flt.groupBy(*by, F.col(value_col).alias("_v")).agg(
        F.sum(
            F.when(F.col(group_col) == sample_a, 1).otherwise(0)
        ).alias("_ca"),
        F.sum(
            F.when(F.col(group_col) == sample_b, 1).otherwise(0)
        ).alias("_cb"),
    )
    wv = Window.partitionBy(*by).orderBy("_v")
    wall = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    st = cells.select(
        *by,
        "_ca",
        "_cb",
        F.coalesce(
            F.sum("_cb").over(
                wv.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("_blt"),
        F.sum("_cb").over(wall).alias("_ball"),
        F.sum("_cb").over(
            wv.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_ble"),
    )
    ca_d = F.col("_ca").cast(d0)
    agg = st.groupBy(*by).agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.sum(ca_d * F.col("_blt").cast(d0)).cast(d0).alias("gt_pairs"),
        F.sum(
            ca_d * (F.col("_ball") - F.col("_ble")).cast(d0)
        ).cast(d0).alias("lt_pairs"),
        F.sum(ca_d * F.col("_cb").cast(d0)).cast(d0).alias("tie_pairs"),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    gtd = F.col("gt_pairs").cast("double")
    ltd = F.col("lt_pairs").cast("double")
    tied = F.col("tie_pairs").cast("double")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        "gt_pairs",
        "lt_pairs",
        "tie_pairs",
        F.when(ok, (gtd - ltd) / (nad * nbd)).alias("delta"),
        F.when(ok, (gtd + tied / F.lit(2.0)) / (nad * nbd)).alias(
            "a_measure"
        ),
    )


def risk_decision_panel(
    df: DataFrame,
    by: list[str],
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Epidemiological decision panel (L425): ``(by..., n, p_exposed,
    p_unexposed, rr, rd, nnt, paf, e_value)`` — the DECISION layer
    over the L216 association scoreboard (RR/OR say how strong; this
    panel says what it would take and what it would buy):

        NNT  = 1/|RD|                 (how many treated per outcome
                                       changed; NULL at RD = 0)
        PAF  = (p − p₀)/p             (Levin population attributable
                                       fraction; NULL at p = 0)
        E-value = RR* + √(RR*·(RR*−1)), RR* = max(RR, 1/RR)
                                      (VanderWeele-Ding 2017: the
                                       confounding strength needed
                                       to explain the association
                                       away; RR < 1 inverted first —
                                       the published convention)

    All from the exact integer 2×2 cells in ONE combinable agg; each
    output one fixed IEEE tree with NULL-when-undefined (zero
    margins, RR undefined, RR* < 1 impossible by construction).
    Exposure/outcome validated strictly binary (the L191 rule).

    No reference counterpart; causal analytics per SURVEY §2.11
    (completes L216 → L239 → L405)."""
    from .validate import assert_binary

    assert_binary(df, exposure_col, "risk_decision_panel")
    assert_binary(df, outcome_col, "risk_decision_panel")
    e = F.col(exposure_col).cast("int")
    y = F.col(outcome_col).cast("int")
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((e == 1) & (y == 1), 1).otherwise(0)).alias("_a"),
        F.sum(F.when((e == 1) & (y == 0), 1).otherwise(0)).alias("_b"),
        F.sum(F.when((e == 0) & (y == 1), 1).otherwise(0)).alias("_c"),
        F.sum(F.when((e == 0) & (y == 0), 1).otherwise(0)).alias("_d"),
    )
    n1 = F.col("_a") + F.col("_b")
    n0 = F.col("_c") + F.col("_d")
    p1 = F.when(n1 > 0, F.col("_a").cast("double") / n1.cast("double"))
    p0 = F.when(n0 > 0, F.col("_c").cast("double") / n0.cast("double"))
    p = (F.col("_a") + F.col("_c")).cast("double") / F.col("n").cast(
        "double"
    )
    rr = F.when(p0 > 0, p1 / p0)
    rd = p1 - p0
    nnt = F.when(
        rd.isNotNull() & (F.abs(rd) > 0), F.lit(1.0) / F.abs(rd)
    )
    paf = F.when(p > 0, (p - p0) / p)
    rr_star = F.when(rr >= 1, rr).otherwise(F.lit(1.0) / rr)
    evalue = F.when(
        rr.isNotNull(),
        rr_star + F.sqrt(rr_star * (rr_star - F.lit(1.0))),
    )
    return agg.select(
        *by,
        "n",
        p1.alias("p_exposed"),
        p0.alias("p_unexposed"),
        rr.alias("rr"),
        rd.alias("rd"),
        nnt.alias("nnt"),
        paf.alias("paf"),
        evalue.alias("e_value"),
    )


def mde_continuous(
    df: DataFrame,
    by: list[str],
    value_col: str,
    target_rel_effect: str = "0.02",
    scale: int = 2,
) -> DataFrame:
    """Continuous MDE / power panel (L426): ``(by..., n, mean, sd,
    mde_abs, mde_rel, n_per_arm_target)`` — the continuous-outcome
    twin of the proportion MDE (L209), for revenue/latency/length
    metrics:

        mde_abs = (z_{α/2} + z_β)·s·√(2/n)   (per-arm n = current
                                              group size — the
                                              "split this traffic in
                                              two" planning frame)
        n_per_arm_target = ⌈2·((z_{α/2}+z_β)·s / (Δ_rel·mean))²⌉

    z quantiles embedded as double LITERALS on both sides (α = 0.05
    two-sided, power = 0.80 — the L209 no-cross-engine-erfinv rule);
    the sample sd comes from exact decimal sums (n·Σx² − (Σx)²);
    ``target_rel_effect`` is a decimal STRING pinned into the plan.
    Zero variance or zero mean → NULL for the affected outputs;
    n < 2 → NULL everything past the mean.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    from decimal import Decimal

    tre = float(Decimal(target_rel_effect))
    if tre <= 0:
        raise ValueError(
            "mde_continuous: target_rel_effect must be > 0"
        )
    dec = f"decimal(18,{scale})"
    x = F.col(value_col).cast(dec)
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("_s"),
            F.sum(x * x).alias("_ss"),
        )
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    ssd = F.col("_ss").cast("double")
    mean = sd_ / nd
    var = (nd * ssd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    s = F.sqrt(var)
    zsum = F.lit(_Z_ALPHA_005 + _Z_POWER_080)
    mde_abs = zsum * s * F.sqrt(F.lit(2.0) / nd)
    ok = (F.col("n") >= 2) & (var > 0)
    n_target = F.ceil(
        F.lit(2.0)
        * (zsum * s / (F.lit(tre) * mean))
        * (zsum * s / (F.lit(tre) * mean))
    )
    return agg.select(
        *by,
        "n",
        mean.alias("mean"),
        F.when(ok, s).alias("sd"),
        F.when(ok, mde_abs).alias("mde_abs"),
        F.when(ok & (mean != 0), mde_abs / mean).alias("mde_rel"),
        F.when(ok & (mean != 0), n_target).alias(
            "n_per_arm_target"
        ),
    )
