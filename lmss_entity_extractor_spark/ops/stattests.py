"""Statistical hypothesis tests (L139/L140): Welch's unequal-variance
t-test for A/B metric comparison and the chi-squared independence test
for categorical association — the two workhorse significance tests of
experiment analysis and data-quality monitoring, re-expressed for
cross-engine bit-identity.

L139 — Welch's t (Welch 1947): per analysis group, compare metric
means of two named variants:

    t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
    df = (v_a/n_a + v_b/n_b)² /
         ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

with m = S/n and v = (n·Sxx − S²)/(n·(n−1)) from EXACT DECIMAL
sufficient statistics (the L135 discipline: order-insensitive sums,
then one fixed IEEE tree — ``sqrt`` is exactly rounded, so the whole
statistic is bit-identical, NO grid).  Variants with n < 2 or zero
pooled standard error yield NULL t/df rather than ±inf.  p-values
need the incomplete beta function (not IEEE-specified) — deliberately
NOT emitted; compare |t| against the caller's critical value.

L140 — chi-squared independence (Pearson): for two categoricals,
χ² = Σ_cells (o − e)²/e with e = row_total·col_total/N.  Counts are
exact integers; each cell term is a fixed tree; the CELL SUM is the
repo's ordered-fold discipline (sorted cell keys, 0.0-prepended
left-assoc fold) since cell count r·c is bounded while float ``SUM``
order is not.  dof = (r−1)(c−1).

Scale shape: both tests are single combinable aggregations over the
fact table (plus bounded margin joins for χ²) — one scan of 100 TB,
stat tables bounded by group/category cardinality.

No reference counterpart; experiment analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def welch_ttest(
    df: DataFrame,
    by: list[str],
    variant_col: str,
    variant_a: str,
    variant_b: str,
    metric_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_a, n_b, mean_a, mean_b, t, dof)`` — Welch's t per
    analysis group.  The metric must be exactly representable at
    ``DECIMAL(18, scale)``; rows of other variants are ignored."""
    dec = f"decimal(18,{scale})"
    yd = F.col(metric_col).cast(dec)
    flt = df.filter(
        F.col(metric_col).isNotNull()
        & F.col(variant_col).isin([variant_a, variant_b])
    )

    def _side(tag, variant):
        return (
            flt.filter(F.col(variant_col) == variant)
            .groupBy(*by)
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(yd).alias(f"s_{tag}"),
                F.sum(yd * yd).alias(f"sxx_{tag}"),
            )
        )

    j = _side("a", variant_a).join(_side("b", variant_b), by, "full_outer")

    def _stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        mean = s / n
        var = (n * sxx - s * s) / (n * (n - F.lit(1.0)))
        return n, mean, var

    na, ma, va = _stats("a")
    nb, mb, vb = _stats("b")
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - F.lit(1.0))
        + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
    )
    ok = (
        F.col("n_a").isNotNull()
        & F.col("n_b").isNotNull()
        & (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & (se2 > F.lit(0.0))
    )
    return j.select(
        *by,
        F.col("n_a"),
        F.col("n_b"),
        F.when(F.col("n_a").isNotNull(), ma).alias("mean_a"),
        F.when(F.col("n_b").isNotNull(), mb).alias("mean_b"),
        F.when(ok, t).alias("t"),
        F.when(ok, dof).alias("dof"),
    )


def chi2_independence(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row ``(chi2, dof, n)`` — Pearson's χ² of independence
    between two categorical columns (NULL categories excluded).
    The cell sum is an ordered fold, so the double is engine-stable."""
    return _chi2_fold(_chi2_terms(df, col_x, col_y)).select(
        "chi2",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.col("n"),
    )


def _chi2_terms(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Shared χ² cell pipeline: contingency cells, broadcast margins,
    and the per-cell (o − e)²/e term with e = rt·ct/n computed once —
    value-identical to the inline-e form the L140 oracle mirrors
    (the same double is produced however many times the expression is
    written).  Both chi2_independence and cramers_v consume this, so
    the expression tree can never silently diverge between them."""
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = flt.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct(F.col("x")).alias("r"),
        F.count_distinct(F.col("y")).alias("c"),
    )
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n").cast(
        "double"
    )
    return (
        cells.join(F.broadcast(rows), "x")
        .join(F.broadcast(cols), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "r",
            "c",
            "x",
            "y",
            (
                (F.col("o").cast("double") - e)
                * (F.col("o").cast("double") - e)
                / e
            ).alias("term"),
        )
    )


def _chi2_fold(terms: DataFrame) -> DataFrame:
    """Collapse a per-cell ``(n, r, c, x, y, term)`` frame into one
    row ``(n, r, c, chi2)`` via the sorted-cell ordered fold."""
    return terms.groupBy("n", "r", "c").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("x", "y", "term"))),
            F.lit(0.0),
            lambda acc, v: acc + v["term"],
        ).alias("chi2")
    )


def cramers_v(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row ``(n, r, c, chi2, v, v_corrected)`` — Cramér's V, the
    [0,1]-normalized effect size of the L140 χ² association (how
    strongly two categoricals co-vary, comparable across tables of
    different shape — the categorical companion to Cohen's d, L186):

        V = sqrt(χ² / (n·(min(r,c) − 1)))

    plus the Bergsma-Wicher bias-corrected form: φ²₊ = max(0,
    χ²/n − (r−1)(c−1)/(n−1)), r̃ = r − (r−1)²/(n−1) (likewise c̃),
    Ṽ = sqrt(φ²₊ / min(r̃−1, c̃−1)).  Both are fixed IEEE trees over
    the ordered-fold χ² and exact integer margins — bit-identical,
    ungridded.  min(r,c) < 2 (a 1×c table) yields NULL v; n ≤ 1 or a
    non-positive corrected denominator yields NULL v_corrected.

    Scale shape: identical to L140 — one combinable cell groupBy,
    broadcast margins, a bounded-cardinality fold."""
    out = _chi2_fold(_chi2_terms(df, col_x, col_y))
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("c").cast("double")
    mind = F.least(rd, cd) - F.lit(1.0)
    v = F.sqrt(F.col("chi2") / (nd * mind))
    phi2p = F.greatest(
        F.lit(0.0),
        F.col("chi2") / nd
        - (rd - 1) * (cd - 1) / (nd - F.lit(1.0)),
    )
    rt_ = rd - (rd - 1) * (rd - 1) / (nd - F.lit(1.0))
    ct_ = cd - (cd - 1) * (cd - 1) / (nd - F.lit(1.0))
    mcorr = F.least(rt_, ct_) - F.lit(1.0)
    vc = F.sqrt(phi2p / mcorr)
    return out.select(
        "n",
        "r",
        "c",
        "chi2",
        F.when(F.least(F.col("r"), F.col("c")) >= 2, v).alias("v"),
        F.when(
            (F.col("n") > 1) & (mcorr > 0), vc
        ).alias("v_corrected"),
    )


def brown_forsythe(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., k, n, f)`` — the Brown-Forsythe test of equal
    variances across the k levels of ``group_col`` (the robust Levene
    variant: one-way ANOVA on absolute deviations from each level's
    median).  The companion diagnostic to Welch's t (L139): Welch
    compares means without assuming equal variances; Brown-Forsythe
    tests that variance assumption itself.

    Per level j: med_j = the DISCRETE median (``percentile_disc`` —
    the L137 convention: an actual data value, engine-exact), then
    z = |value − med_j| and the exact sufficient statistics
    (n_j, Σz, Σz²) in DECIMAL.  With k bounded (treatment levels),
    the F statistic is the repo's ordered-fold discipline — grand
    mean from exact sums, then

        SSB = Σ_j n_j·(z̄_j − z̄)²   (sorted-level left fold)
        SSW = Σ_j (Σz²_j − (Σz_j)²/n_j)
        F   = (SSB/(k−1)) / (SSW/(N−k))

    — each per-level term a fixed IEEE tree over exact decimals, the
    level sums ordered folds (bounded length), so F is bit-identical
    across engines and parallelism, NO grid.  k < 2, N ≤ k, or
    SSW ≤ 0 (all levels constant) yields NULL f.

    Scale shape: one order-statistic agg + one co-partitioned join
    back (the L137 shape) + one combinable stats agg; the fold runs
    over a k-length array per analysis group.  100 TB scans twice
    (median pass + deviation pass), both full-parallel.
    """
    keys = [*by, group_col]
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    med = vals.groupBy(*keys).agg(
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("_med")
    )
    dec = "decimal(18,4)"
    z = F.abs(
        F.col(value_col).cast(dec) - F.col("_med").cast(dec)
    )
    per = (
        vals.join(med, keys)
        .select(*keys, z.alias("_z"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_z").alias("_s"),
            F.sum(F.col("_z") * F.col("_z")).alias("_q"),
        )
    )
    arr = per.groupBy(*by).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("_stot"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(group_col).alias("g"),
                    F.col("_n").alias("nj"),
                    F.col("_s").cast("double").alias("sj"),
                    F.col("_q").cast("double").alias("qj"),
                )
            )
        ).alias("_lv"),
    )
    grand = F.col("_stot").cast("double") / F.col("n").cast("double")
    ssb = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + v["nj"].cast("double")
        * (v["sj"] / v["nj"].cast("double") - grand)
        * (v["sj"] / v["nj"].cast("double") - grand),
    )
    ssw = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["qj"] - v["sj"] * v["sj"] / v["nj"].cast("double")),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    fstat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
    return arr.select(*by, "k", "n", F.when(ok, fstat).alias("f"))


def oneway_anova(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., k, n, f, eta_sq)`` — the classic one-way fixed-effects
    ANOVA F (does the MEAN differ across the k levels — the parametric
    complement to Kruskal-Wallis L174; Brown-Forsythe L193 runs the
    same machinery on median deviations to test VARIANCE instead) plus
    η², the fraction of variance the grouping explains.

    Values contract-quantized at DECIMAL(18,scale).  Per level the
    exact sufficient statistics (n_j, Σv, Σv²) aggregate combinably;
    with k bounded, SSB/SSW are the repo's sorted-level ordered folds
    (each per-level term a fixed IEEE tree over exact decimals):

        SSB = Σ_j n_j(v̄_j − v̄)²,  SSW = Σ_j (Σv²_j − (Σv_j)²/n_j)
        F = (SSB/(k−1)) / (SSW/(n−k)),   η² = SSB/(SSB+SSW)

    — bit-identical, ungridded.  k < 2, n ≤ k, or SSW ≤ 0 yields
    NULL f (η² still emitted when SSB+SSW > 0).

    Scale shape: ONE combinable groupBy; the folds run over k-length
    arrays.  100 TB scans once — one pass, unlike L193's two."""
    dec = f"decimal(18,{scale})"
    vd = F.col(value_col).cast(dec)
    per = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .groupBy(*by, F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(vd).alias("_s"),
            F.sum(vd * vd).alias("_q"),
        )
    )
    arr = per.groupBy(*by).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias("_stot"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    F.col("_n").alias("nj"),
                    F.col("_s").cast("double").alias("sj"),
                    F.col("_q").cast("double").alias("qj"),
                )
            )
        ).alias("_lv"),
    )
    grand = F.col("_stot").cast("double") / F.col("n").cast("double")
    ssb = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + v["nj"].cast("double")
        * (v["sj"] / v["nj"].cast("double") - grand)
        * (v["sj"] / v["nj"].cast("double") - grand),
    )
    ssw = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["qj"] - v["sj"] * v["sj"] / v["nj"].cast("double")),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    fstat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0)
    return arr.select(
        *by,
        "k",
        "n",
        F.when(ok, fstat).alias("f"),
        F.when(ssb + ssw > 0, ssb / (ssb + ssw)).alias("eta_sq"),
    )


def runs_test(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n, n1, n0, runs, z)`` — the Wald-Wolfowitz runs test
    of a BINARY sequence per series (is the order random, or do
    successes clump — the sequence-level randomness check that
    Durbin-Watson, L217, asks of magnitudes):

        R    = 1 + Σ_t [x_t ≠ x_{t−1}]
        E[R] = 1 + 2·n1·n0/n
        Var  = 2·n1·n0·(2·n1·n0 − n) / (n²·(n−1))

    — run counting is ONE keyed lag window; every moment is an exact
    DECIMAL(38,0) integer ratio folded in a fixed IEEE z tree:
    bit-identical, ungridded.  Non-binary values refused; one-sided
    series (n1 = 0 or n0 = 0) or Var ≤ 0 yields NULL z.  Duplicate
    order keys refused (the lag rule).

    Scale shape: one keyed window + one combinable agg."""
    xv = F.col(value_col).cast("int")
    flt = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    )
    # ONE validation job for both preconditions (binary values checked
    # on the RAW column; duplicate order keys) — not two full scans
    dv = F.col(value_col).try_cast("double")
    chk = (
        flt.groupBy(*by, order_col)
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(
                (dv.isNull() | ~dv.isin([0.0, 1.0])).cast("long")
            ).alias("_b"),
        )
        .agg(
            F.coalesce(F.max("_c"), F.lit(0)).alias("mx"),
            F.coalesce(F.sum("_b"), F.lit(0)).alias("nb"),
        )
        .collect()[0]
    )
    if chk["nb"]:
        raise ValueError(
            f"runs_test: {chk['nb']} row(s) with non-binary value in "
            f"{value_col!r}"
        )
    if chk["mx"] > 1:
        raise ValueError(
            "runs_test: duplicate order key(s) within a series"
        )
    from pyspark.sql import Window as _W

    w = _W.partitionBy(*by).orderBy(order_col)
    staged = flt.select(
        *by,
        xv.alias("_x"),
        (xv != F.lag(xv).over(w)).cast("long").alias("_chg"),
    )
    agg = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("n1"),
        F.sum(F.lit(1) - F.col("_x")).alias("n0"),
        (F.coalesce(F.sum("_chg"), F.lit(0)) + 1).alias("runs"),
    )
    dec = "decimal(38,0)"
    nd = F.col("n").cast(dec)
    p2 = F.lit(2).cast(dec) * F.col("n1").cast(dec) * F.col("n0").cast(dec)
    mean = F.lit(1.0) + p2.cast("double") / nd.cast("double")
    var = (p2 * (p2 - nd)).cast("double") / (
        nd * nd * (nd - 1)
    ).cast("double")
    z = (F.col("runs").cast("double") - mean) / F.sqrt(var)
    ok = (F.col("n1") > 0) & (F.col("n0") > 0) & (var > 0)
    return agg.select(*by, "n", "n1", "n0", "runs", F.when(ok, z).alias("z"))


def sign_test(
    df: DataFrame,
    by: list[str],
    col_x: str,
    col_y: str,
) -> DataFrame:
    """``(by..., n_pos, n_neg, n_tie, n, z)`` — the paired sign test
    (L223): the assumption-free companion to Wilcoxon signed-rank
    (L189) — it uses only the SIGN of each within-pair difference, so
    it needs no symmetry assumption and no ranks at all.

        n_pos = #(x > y),  n_neg = #(x < y),  ties dropped (standard)
        z = (2·n_pos − n) / sqrt(n),   n = n_pos + n_neg

    Counts are exact integers from ONE combinable aggregation; z is a
    fixed IEEE tree (one exactly-rounded sqrt, one division) —
    bit-identical, ungridded; compare |z| against the caller's
    critical value (the exact binomial tail needs the incomplete beta,
    deliberately not emitted — the L139 discipline).  n = 0 (all
    ties / empty) → NULL z.  NULL-x/y rows are excluded (a NULL pair
    carries no sign).

    Scale shape: one scan, one combinable groupBy — 100 TB of pairs
    needs no shuffle beyond the final per-group exchange.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    x, y = F.col(col_x), F.col(col_y)
    agg = flt.groupBy(*by).agg(
        F.sum(F.when(x > y, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(x < y, 1).otherwise(0)).alias("n_neg"),
        F.sum(F.when(x == y, 1).otherwise(0)).alias("n_tie"),
    )
    n = F.col("n_pos") + F.col("n_neg")
    z = (F.lit(2) * F.col("n_pos") - n).cast("double") / F.sqrt(
        n.cast("double")
    )
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        "n_tie",
        n.alias("n"),
        F.when(n > 0, z).alias("z"),
    )


def mood_median(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., k, n, n_above, chi2, dof)`` — Mood's median test
    (L224): do the k levels of ``group_col`` share a common median?
    The nonparametric location counterpart to Brown-Forsythe (L193,
    same shape, variance): dichotomize every value at the POOLED
    discrete median (``percentile_disc(0.5)`` per analysis group, the
    L137/L193 convention — an actual data value, engine-exact; values
    EQUAL to the median count as not-above, documented standard), then
    Pearson χ² on the k×2 (level × above/at-or-below) table with
    dof = k − 1 under fixed column margins.

    Exactness: all cell counts and margins are exact integers; each
    expected count e = n_j·A/N and each (o−e)²/e is a fixed IEEE tree;
    the 2k cell terms fold over the BOUNDED sorted level list (the
    L140/L193 ordered-fold discipline) — bit-identical, ungridded.
    k < 2 or a degenerate dichotomy (A = 0 or A = N, every value on
    one side) → NULL chi2.

    Scale shape: one order-statistic agg per analysis group + one
    co-partitioned join back + one combinable count agg; the fold runs
    over a k-length array.  100 TB scans twice, both passes parallel.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    med = vals.groupBy(*by).agg(
        F.expr(
            f"percentile_disc(0.5) WITHIN GROUP (ORDER BY {value_col})"
        ).alias("_med")
    )
    per = (
        vals.join(med, by) if by else vals.crossJoin(F.broadcast(med))
    )
    per = per.groupBy(*by, group_col).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(
            F.when(F.col(value_col) > F.col("_med"), 1).otherwise(0)
        ).alias("_aj"),
    )
    arr = per.groupBy(*by).agg(
        F.sum("_nj").alias("n"),
        F.sum("_aj").alias("n_above"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(group_col).alias("g"),
                    F.col("_nj").alias("nj"),
                    F.col("_aj").alias("aj"),
                )
            )
        ).alias("_lv"),
    )
    nd = F.col("n").cast("double")
    ad = F.col("n_above").cast("double")
    bd = (F.col("n") - F.col("n_above")).cast("double")

    def _term(o, e):
        return (o - e) * (o - e) / e

    chi2 = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + _term(
            v["aj"].cast("double"), v["nj"].cast("double") * ad / nd
        )
        + _term(
            (v["nj"] - v["aj"]).cast("double"),
            v["nj"].cast("double") * bd / nd,
        ),
    )
    ok = (
        (F.col("k") >= 2)
        & (F.col("n_above") > 0)
        & (F.col("n_above") < F.col("n"))
    )
    return arr.select(
        *by,
        "k",
        "n",
        "n_above",
        F.when(ok, chi2).alias("chi2"),
        (F.col("k") - F.lit(1)).alias("dof"),
    )


def grubbs_test(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, mean, sd, grubbs_g, x_out)`` — the Grubbs (1950) maximum
    normed residual test (L229): is the single most extreme value an
    outlier — G = max|x − x̄|/s, the formal companion to the L137 MAD
    screen (MAD flags many, Grubbs tests THE worst one against a
    normal-theory critical value).

    The statistic column is ``grubbs_g`` (a bare ``g`` collides with
    single-letter group columns — the L186 lesson).

    Exactness: x̄ = S/n and s from EXACT DECIMAL sufficient statistics
    (the L135/L139 discipline — order-insensitive sums, then one fixed
    IEEE tree); each |x − x̄| is a per-row fixed tree; ``max`` is
    order-insensitive, so G is bit-identical, ungridded.  ``x_out`` is
    the offending value (deviation ties resolve to the LARGER value —
    deterministic).  n < 3 or zero variance → NULL g/sd.

    Scale shape: one stats agg + one broadcast join back + one
    combinable max agg — two scans of 100 TB, both full-parallel.

    No reference counterpart; data-quality analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    xd = F.col(value_col).cast(dec)
    stats = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_sxx"),
    )
    joined = (
        flt.join(F.broadcast(stats), by)
        if by
        else flt.crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    sd_ = F.col("_s").cast("double")
    sxxd = F.col("_sxx").cast("double")
    mean = sd_ / nd
    dev = F.abs(xd.cast("double") - mean)
    per = joined.select(
        *by, "_n", "_s", "_sxx", dev.alias("_d"), xd.cast("double").alias("_x")
    ).groupBy(*by, "_n", "_s", "_sxx").agg(
        F.max(F.struct(F.col("_d").alias("d"), F.col("_x").alias("x"))).alias(
            "_b"
        )
    )
    var = (nd * sxxd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    sdev = F.sqrt(var)
    ok = (F.col("_n") >= 3) & (var > 0.0)
    return per.select(
        *by,
        F.col("_n").alias("n"),
        mean.alias("mean"),
        F.when(ok, sdev).alias("sd"),
        F.when(ok, F.col("_b.d") / sdev).alias("grubbs_g"),
        F.col("_b.x").alias("x_out"),
    )


def cochran_armitage(
    df: DataFrame,
    by: list[str],
    score_col: str,
    success_col: str,
) -> DataFrame:
    """``(by..., k, n, n_success, z)`` — the Cochran-Armitage trend
    test (L230): is a binary rate MONOTONICALLY trending across
    ordered dose/bucket levels — the directional sharpening of the
    omnibus χ² (L140 asks "any association"; this asks "a trend in
    THIS order", with k−2 more power when the order is real).
    ``score_col`` carries the integer level scores s_j; ``success_col``
    must be 0/1 (validated loudly, the L191 discipline).

    With per-level exact integers n_j (trials) and a_j (successes),
    A = Σa_j, N = Σn_j, S1 = Σs_j·n_j, S2 = Σs_j²·n_j, T = Σs_j·a_j:

        num = T − A·S1/N
        var = (A/N)·(1 − A/N)·(S2 − S1²/N)
        z   = num / sqrt(var)

    All sums are exact DECIMAL(38,0) (order-insensitive — no fold even
    needed); num/var/z are fixed IEEE trees — bit-identical,
    ungridded.  Degenerate var (one level, constant outcome, constant
    score) → NULL z.

    Scale shape: one combinable (keys, score) groupBy + one combinable
    rollup — 100 TB scans once.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = "decimal(38,0)"
    flt = df.filter(
        F.col(score_col).isNotNull() & F.col(success_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(~F.col(success_col).isin([0, 1])).count()
        if n_bad:
            raise ValueError(
                f"cochran_armitage: {n_bad} non-binary value(s) in "
                f"{success_col!r} — the test is defined on 0/1 outcomes"
            )
    per = flt.groupBy(*by, score_col).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(F.col(success_col).cast("long")).alias("_aj"),
    )
    s = F.col(score_col).cast(dec)
    agg = per.groupBy(*by).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_nj").alias("n"),
        F.sum("_aj").alias("n_success"),
        F.sum(s * F.col("_nj").cast(dec)).alias("_s1"),
        F.sum(s * s * F.col("_nj").cast(dec)).alias("_s2"),
        F.sum(s * F.col("_aj").cast(dec)).alias("_t"),
    )
    nd = F.col("n").cast("double")
    ad = F.col("n_success").cast("double")
    s1d = F.col("_s1").cast("double")
    s2d = F.col("_s2").cast("double")
    td = F.col("_t").cast("double")
    num = td - (ad * s1d) / nd
    var = (
        (ad / nd)
        * (F.lit(1.0) - ad / nd)
        * (s2d - (s1d * s1d) / nd)
    )
    ok = var > 0.0
    return agg.select(
        *by,
        "k",
        "n",
        "n_success",
        F.when(ok, num / F.sqrt(var)).alias("z"),
    )


def bartlett(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., k, n, t, c, stat)`` — Bartlett's test of equal
    variances (L232): the classical, more POWERFUL-under-normality
    counterpart to Brown-Forsythe (L193 is robust to non-normality;
    Bartlett is the sharper instrument when the metric is known to be
    well-behaved).  Per level, s²_j comes from exact decimal
    sufficient statistics (the L139 tree); then over the BOUNDED
    sorted level list (one collected array, THREE folds in the same
    element order):

        Sp² = Σ(n_j−1)s²_j / (N−k)
        T   = (N−k)·ln(Sp²) − Σ(n_j−1)·ln(s²_j)
        C   = 1 + (Σ 1/(n_j−1) − 1/(N−k)) / (3(k−1))
        stat = T / C        (≈ χ²_{k−1})

    ln is the one transcendental — the same cross-engine-stable libm
    call the L152/L145 family already relies on; every other node is
    an exactly-rounded fixed tree.  k < 2, any n_j < 2, or any
    s²_j ≤ 0 → NULL t/c/stat (k, n still reported).

    Scale shape: one combinable stats agg + one bounded-array agg —
    100 TB scans once.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    per = flt.groupBy(*by, group_col).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_sxx"),
    )
    njd = F.col("_nj").cast("double")
    s2 = (
        njd * F.col("_sxx").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double")
    ) / (njd * (njd - F.lit(1.0)))
    arr = per.select(
        *by,
        F.col(group_col).alias("_g"),
        F.col("_nj"),
        s2.alias("_s2"),
    ).groupBy(*by).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_nj").alias("n"),
        F.min("_nj").alias("_minn"),
        F.min("_s2").alias("_mins2"),
        F.sort_array(
            F.collect_list(F.struct("_g", "_nj", "_s2"))
        ).alias("_lv"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    nmk = nd - kd
    sp_num = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_nj"].cast("double") - F.lit(1.0)) * v["_s2"],
    )
    lnsum = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_nj"].cast("double") - F.lit(1.0)) * F.log(v["_s2"]),
    )
    invsum = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + F.lit(1.0) / (v["_nj"].cast("double") - F.lit(1.0)),
    )
    t = nmk * F.log(sp_num / nmk) - lnsum
    c = F.lit(1.0) + (invsum - F.lit(1.0) / nmk) / (
        F.lit(3.0) * (kd - F.lit(1.0))
    )
    ok = (
        (F.col("k") >= 2)
        & (F.col("_minn") >= 2)
        & (F.col("_mins2") > 0.0)
    )
    return arr.select(
        *by,
        "k",
        "n",
        F.when(ok, t).alias("t"),
        F.when(ok, c).alias("c"),
        F.when(ok, t / c).alias("stat"),
    )


def mantel_haenszel(
    df: DataFrame,
    strata_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """One row ``(k_strata, n, n_exposed, or_mh, chi2_mh)`` — the
    Mantel-Haenszel stratified 2×2 analysis (L239): the pooled odds
    ratio and common-association test ACROSS confounder strata — the
    formal tool for the Simpson's-paradox situation the L141-audit
    query flags (per-stratum association pooled WITHOUT collapsing
    the table):

        OR_MH  = Σᵢ aᵢdᵢ/nᵢ  /  Σᵢ bᵢcᵢ/nᵢ
        χ²_MH  = (Σaᵢ − ΣEᵢ)² / ΣVᵢ          (no continuity corr.)
        Eᵢ = (aᵢ+bᵢ)(aᵢ+cᵢ)/nᵢ
        Vᵢ = (aᵢ+bᵢ)(cᵢ+dᵢ)(aᵢ+cᵢ)(bᵢ+dᵢ) / (nᵢ²(nᵢ−1))

    Cell counts are exact integers from ONE combinable groupBy; the
    per-stratum terms are fixed IEEE trees folded over the BOUNDED
    sorted stratum list (the L140/L193 discipline) — bit-identical,
    ungridded.  Binary exposure/outcome validated loudly (L191).
    Zero denominator (no discordant product in any stratum) → NULL
    or_mh; ΣV = 0 (degenerate margins everywhere) → NULL chi2_mh.

    Scale shape: one scan, one combinable groupBy, k-length folds.

    No reference counterpart; causal/experiment analytics per SURVEY
    §2.11.
    """
    e = F.col(exposure_col).cast("int")
    y = F.col(outcome_col).cast("int")
    flt = df.filter(
        F.col(strata_col).isNotNull()
        & F.col(exposure_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(
            ~F.col(exposure_col).isin([0, 1]) | ~F.col(outcome_col).isin([0, 1])
        ).count()
        if n_bad:
            raise ValueError(
                f"mantel_haenszel: {n_bad} non-binary exposure/outcome row(s)"
            )
    per = flt.groupBy(F.col(strata_col).alias("_s")).agg(
        F.sum(((e == 1) & (y == 1)).cast("long")).alias("_a"),
        F.sum(((e == 1) & (y == 0)).cast("long")).alias("_b"),
        F.sum(((e == 0) & (y == 1)).cast("long")).alias("_c"),
        F.sum(((e == 0) & (y == 0)).cast("long")).alias("_d"),
    )
    arr = per.agg(
        F.count(F.lit(1)).alias("k_strata"),
        F.sum(
            F.col("_a") + F.col("_b") + F.col("_c") + F.col("_d")
        ).alias("n"),
        F.sum(F.col("_a") + F.col("_b")).alias("n_exposed"),
        F.sum("_a").alias("_suma"),
        F.sort_array(
            F.collect_list(F.struct("_s", "_a", "_b", "_c", "_d"))
        ).alias("_lv"),
    )

    def _f(v, name):
        return v[name].cast("double")

    def _ni(v):
        return (v["_a"] + v["_b"] + v["_c"] + v["_d"]).cast("double")

    num = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc + (_f(v, "_a") * _f(v, "_d")) / _ni(v),
    )
    den = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc + (_f(v, "_b") * _f(v, "_c")) / _ni(v),
    )
    esum = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (
            (v["_a"] + v["_b"]).cast("double")
            * (v["_a"] + v["_c"]).cast("double")
        )
        / _ni(v),
    )
    # singleton strata (n_i = 1) have no pairable variance: their V
    # term is 0 by convention rather than a 0/0
    vsum = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + F.when(
            _ni(v) > F.lit(1.0),
            (
                (v["_a"] + v["_b"]).cast("double")
                * (v["_c"] + v["_d"]).cast("double")
                * (v["_a"] + v["_c"]).cast("double")
                * (v["_b"] + v["_d"]).cast("double")
            )
            / (_ni(v) * _ni(v) * (_ni(v) - F.lit(1.0))),
        ).otherwise(F.lit(0.0)),
    )
    diff = F.col("_suma").cast("double") - esum
    return arr.select(
        "k_strata",
        "n",
        "n_exposed",
        F.when(den > 0.0, num / den).alias("or_mh"),
        F.when(vsum > 0.0, (diff * diff) / vsum).alias("chi2_mh"),
    )


def poisson_rate_test(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    event_col: str,
    exposure_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., c_a, c_b, t_a, t_b, rate_a, rate_b, rate_ratio, z)``
    — the two-sample Poisson rate test (L250; conditional/binomial
    form): are events arriving faster in stream A than B once
    EXPOSURE (observation time, request volume) is accounted for —
    the event-RATE companion to the proportion test (L216 compares
    per-trial probabilities; this compares per-unit-time intensities).

    With exact integer event counts c and exact DECIMAL exposures t,
    conditioning on c_a + c_b makes c_a Binomial(c, p₀),
    p₀ = t_a/(t_a + t_b):

        z = (c_a − c·p₀) / sqrt(c·p₀·(1 − p₀))

    p₀ is ONE exactly-rounded division of exact decimals and z one
    fixed tree — bit-identical, ungridded.  rate = c/t (one division
    each); c_a + c_b = 0 or a zero/degenerate exposure split → NULL z.
    Negative exposures refused loudly.

    Scale shape: one combinable groupBy — one scan of 100 TB of
    events.

    No reference counterpart; rate-monitoring analytics per SURVEY
    §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(group_col).isin([sample_a, sample_b])
        & F.col(event_col).isNotNull()
        & F.col(exposure_col).isNotNull()
    )
    if validation_enabled():
        n_neg = flt.filter(
            (F.col(exposure_col) < 0) | (F.col(event_col) < 0)
        ).count()
        if n_neg:
            raise ValueError(
                f"poisson_rate_test: {n_neg} negative event/exposure row(s)"
            )
    is_a = F.col(group_col) == sample_a
    agg = flt.groupBy(*by).agg(
        F.sum(F.when(is_a, F.col(event_col).cast("long")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(
            F.when(~is_a, F.col(event_col).cast("long")).otherwise(0)
        ).alias("c_b"),
        F.sum(
            F.when(is_a, F.col(exposure_col).cast(dec)).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("_ta"),
        F.sum(
            F.when(~is_a, F.col(exposure_col).cast(dec)).otherwise(
                F.lit(0).cast(dec)
            )
        ).alias("_tb"),
    )
    c = F.col("c_a") + F.col("c_b")
    tad = F.col("_ta").cast("double")
    tbd = F.col("_tb").cast("double")
    p0 = (F.col("_ta").cast("double")) / (
        (F.col("_ta") + F.col("_tb")).cast("double")
    )
    cd = c.cast("double")
    z = (F.col("c_a").cast("double") - cd * p0) / F.sqrt(
        cd * p0 * (F.lit(1.0) - p0)
    )
    rate_a = F.col("c_a").cast("double") / tad
    rate_b = F.col("c_b").cast("double") / tbd
    ok = (c > 0) & (p0 > 0.0) & (p0 < 1.0)
    return agg.select(
        *by,
        "c_a",
        "c_b",
        F.col("_ta").cast("double").alias("t_a"),
        F.col("_tb").cast("double").alias("t_b"),
        F.when(F.col("_ta") > 0, rate_a).alias("rate_a"),
        F.when(F.col("_tb") > 0, rate_b).alias("rate_b"),
        F.when(
            (F.col("_ta") > 0) & (F.col("_tb") > 0) & (F.col("c_b") > 0),
            rate_a / rate_b,
        ).alias("rate_ratio"),
        F.when(ok, z).alias("z"),
    )


def g_test(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row ``(n, r, c, g, dof)`` — the likelihood-ratio G-test of
    independence (L252): the other classical contingency test next to
    Pearson's χ² (L140) — additive across nested partitions (G over a
    merged table = Σ G over its parts, which χ² is not), and the one
    whose terms ARE the mutual information (G = 2N·MI in nats,
    pinned against L152 by test):

        G = 2 Σ_cells o·ln(o·N / (rt·ct))

    Observed cells only (o ≥ 1 by construction, so no 0·ln 0 edge);
    counts exact integers; each term one fixed IEEE tree (ln is the
    L152-family libm reliance); the cell fold is the L140 sorted-cell
    discipline.  dof = (r−1)(c−1); a 1×c / r×1 table → NULL g.

    Scale shape: identical to L140 — one combinable cell groupBy +
    broadcast margins + a bounded fold.

    No reference counterpart; association analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = flt.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct(F.col("x")).alias("r"),
        F.count_distinct(F.col("y")).alias("c"),
    )
    od = F.col("o").cast("double")
    term = od * F.log(
        od * F.col("n").cast("double")
        / (F.col("rt") * F.col("ct")).cast("double")
    )
    terms = (
        cells.join(F.broadcast(rows), "x")
        .join(F.broadcast(cols), "y")
        .crossJoin(F.broadcast(tot))
        .select("n", "r", "c", "x", "y", term.alias("term"))
    )
    agg = terms.groupBy("n", "r", "c").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("x", "y", "term"))),
            F.lit(0.0),
            lambda acc, v: acc + v["term"],
        ).alias("_s")
    )
    ok = (F.col("r") >= 2) & (F.col("c") >= 2)
    return agg.select(
        "n",
        "r",
        "c",
        F.when(ok, F.lit(2.0) * F.col("_s")).alias("g"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
    )


def icc_oneway(
    df: DataFrame,
    by: list[str],
    unit_col: str,
    value_col: str,
    scale: int = 4,
    max_units: int = 10_000,
) -> DataFrame:
    """``(by..., n_units, n, msb, msw, k0, icc)`` — the one-way
    random-effects intraclass correlation ICC(1,1) (L255): how much of
    a CONTINUOUS score's variance lives between units vs within them —
    the continuous-scale member of the agreement family (κ/α/W handle
    categories and ranks; ICC handles the rubric score itself) and the
    design-effect input for clustered experiments:

        ICC = (MSB − MSW) / (MSB + (k₀ − 1)·MSW)
        k₀  = (N − Σn_j²/N) / (J − 1)      (unbalanced correction)

    MSB/MSW come from exact DECIMAL per-unit sufficient statistics
    (the L135/L139 discipline): Σn_j², ΣS_j, ΣSxx_j are
    order-insensitive exact decimal sums, and the one per-unit
    DIVISION sum Σ S_j²/n_j folds over the sorted unit list — which is
    why the unit count must stay BOUNDED (the L174/L193 contract;
    rater×item designs are small by nature).  Groups exceeding
    ``max_units`` (10⁴) refuse loudly.

    Degenerate (J < 2, N ≤ J, or a zero denominator) → NULL icc.

    Scale shape: one combinable (keys, unit) groupBy + one bounded
    fold.  100 TB scans once.

    No reference counterpart; annotation-QA analytics per SURVEY
    §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    per = flt.groupBy(*by, F.col(unit_col).alias("_u")).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_sxx"),
    )
    sizes = per.groupBy(*by).agg(F.count(F.lit(1)).alias("_ju"))
    if validation_enabled():
        over = sizes.filter(F.col("_ju") > max_units).count()
        if over:
            raise ValueError(
                f"icc_oneway: a group exceeds max_units={max_units} — the "
                "per-unit fold must stay bounded; bucket units first"
            )
    arr = per.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_nj").alias("n"),
        F.sum("_s").alias("_st"),
        F.sum("_sxx").alias("_qt"),
        F.sum(F.col("_nj").cast("decimal(38,0)") * F.col("_nj")).alias(
            "_nsq"
        ),
        F.sort_array(
            F.collect_list(F.struct("_u", "_nj", "_s"))
        ).alias("_lv"),
    )
    ssb_units = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_s"].cast("double") * v["_s"].cast("double"))
        / v["_nj"].cast("double"),
    )
    nd = F.col("n").cast("double")
    jd = F.col("n_units").cast("double")
    td = F.col("_st").cast("double")
    ssb = ssb_units - (td * td) / nd
    ssw = F.col("_qt").cast("double") - ssb_units
    msb = ssb / (jd - F.lit(1.0))
    msw = ssw / (nd - jd)
    k0 = (nd - F.col("_nsq").cast("double") / nd) / (jd - F.lit(1.0))
    den = msb + (k0 - F.lit(1.0)) * msw
    ok = (
        (F.col("n_units") >= 2)
        & (F.col("n") > F.col("n_units"))
        & (den != F.lit(0.0))
    )
    return arr.select(
        *by,
        "n_units",
        "n",
        F.when(F.col("n_units") >= 2, msb).alias("msb"),
        F.when(F.col("n") > F.col("n_units"), msw).alias("msw"),
        F.when(F.col("n_units") >= 2, k0).alias("k0"),
        F.when(ok, (msb - msw) / den).alias("icc"),
    )


def tukey_hsd(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., g_a, g_b, n_a, n_b, mean_a, mean_b, q)`` — the
    Tukey-Kramer studentized-range statistic for every treatment pair
    (L256): AFTER the L215 one-way ANOVA rejects, WHICH means differ —
    the parametric counterpart to Dunn (L233, ranks):

        q_ab = (m_a − m_b) / sqrt((MSW/2)·(1/n_a + 1/n_b))

    (the Kramer unbalanced form).  Per-level exact DECIMAL sufficient
    statistics; MSW = Σ(Sxx_j − S_j²/n_j)/(N−k) folded over the
    BOUNDED sorted level list (the L193 discipline); each pair's q is
    a fixed IEEE tree over the broadcast MSW; pairs are emitted once
    with g_a < g_b.  Compare |q| against the studentized-range
    critical value (p-values deliberately not emitted).  MSW ≤ 0 or
    N ≤ k → NULL q.

    Scale shape: one combinable (keys, level) groupBy + a bounded k×k
    pair join — the L233 shape with decimal stats instead of ranks.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    per = flt.groupBy(*by, F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_sxx"),
    )
    arr = per.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("_nj").alias("_n"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_g"),
                        F.col("_sxx").cast("double").alias("_qd"),
                        F.col("_s").cast("double").alias("_sd"),
                        F.col("_nj").cast("double").alias("_njd"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, v: acc
            + (v["_qd"] - (v["_sd"] * v["_sd"]) / v["_njd"]),
        ).alias("_ssw"),
    )
    nd = F.col("_n").cast("double")
    kd = F.col("_k").cast("double")
    msw = F.col("_ssw") / (nd - kd)
    stats = arr.select(
        *by,
        "_k",
        "_n",
        F.when((F.col("_n") > F.col("_k")) & (msw > 0.0), msw).alias(
            "_msw"
        ),
    )
    a = per.select(
        *by,
        F.col("_g").alias("g_a"),
        F.col("_nj").alias("n_a"),
        F.col("_s").alias("_sa"),
    )
    b = per.select(
        *by,
        F.col("_g").alias("g_b"),
        F.col("_nj").alias("n_b"),
        F.col("_s").alias("_sb"),
    )
    pairs = (
        a.join(b, [*by]) if by else a.crossJoin(b)
    ).filter(F.col("g_a") < F.col("g_b"))
    pairs = (
        pairs.join(F.broadcast(stats), by)
        if by
        else pairs.crossJoin(F.broadcast(stats))
    )
    ma = F.col("_sa").cast("double") / F.col("n_a").cast("double")
    mb = F.col("_sb").cast("double") / F.col("n_b").cast("double")
    q = (ma - mb) / F.sqrt(
        (F.col("_msw") / F.lit(2.0))
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return pairs.select(
        *by,
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when(F.col("_msw").isNotNull(), q).alias("q"),
    )


def chi2_residuals(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """``(x, y, o, e, pearson_resid, adj_resid)`` — per-cell Pearson
    and adjusted (Haberman) standardized residuals (L263): AFTER the
    omnibus χ² (L140) or G (L252) rejects, WHICH cells drive the
    association —

        r     = (o − e) / sqrt(e)
        r_adj = (o − e) / sqrt(e·(1 − rt/N)·(1 − ct/N))

    (|r_adj| ≳ 2 flags a cell).  Rides the SAME cell/margin pipeline
    as L140 (`_chi2_terms`' construction): exact integer counts, the
    identical e = rt·ct/N tree, one fixed tree per residual — per-CELL
    output, no folds needed at all (the L164 aggregate-with-discipline
    rule: callers rank/filter the bounded cell table).  Degenerate
    margins (rt = N or ct = N) → NULL adj_resid.

    Scale shape: identical to L140 — one combinable cell groupBy +
    broadcast margins; output bounded by r·c.

    No reference counterpart; association analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = flt.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    j = (
        cells.join(F.broadcast(rows), "x")
        .join(F.broadcast(cols), "y")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    e = (F.col("rt") * F.col("ct")).cast("double") / nd
    diff = F.col("o").cast("double") - e
    adj_den = e * (
        F.lit(1.0) - F.col("rt").cast("double") / nd
    ) * (F.lit(1.0) - F.col("ct").cast("double") / nd)
    return j.select(
        "x",
        "y",
        "o",
        e.alias("e"),
        F.when(e > 0.0, diff / F.sqrt(e)).alias("pearson_resid"),
        F.when(adj_den > 0.0, diff / F.sqrt(adj_den)).alias("adj_resid"),
    )


def jarque_bera(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, mean, skew, ex_kurt, jb)`` — the Jarque-Bera
    normality test (L266): are a metric's third and fourth moments
    consistent with a normal distribution — the standard residual /
    metric-distribution gate (Jarque & Bera 1980):

        JB = n/6 · (g₁² + g₂²/4),   g₁ = m₃/m₂^{3/2},  g₂ = m₄/m₂² − 3

    Values are quantized to exact integer micro-units q = x·10^scale
    (the L234 trick), so the four power sums Σq..Σq⁴ are EXACT
    DECIMAL(38,0) integers — order-insensitive, combinable, no folds.
    g₁/g₂ are scale-invariant, so the central-moment tree runs
    directly in q-units: one fixed IEEE expression per group,
    bit-identical across engines.  n < 2 or zero variance → NULL
    g₁/g₂/JB.  DECIMAL(38,0) bounds Σq⁴: |q| ≤ 10⁷ supports ~10⁸
    rows per group before ANSI overflow fails loudly (never wraps).

    Scale shape: ONE combinable aggregation — one scan of 100 TB,
    output bounded by group cardinality.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    q = (
        (F.col(value_col).cast(dec) * F.lit(10**scale))
        .cast("decimal(38,0)")
    )
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .select(*by, q.alias("_q"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_q").alias("_s1"),
            F.sum(F.col("_q") * F.col("_q")).alias("_s2"),
            F.sum(F.col("_q") * F.col("_q") * F.col("_q")).alias("_s3"),
            F.sum(
                F.col("_q") * F.col("_q") * F.col("_q") * F.col("_q")
            ).alias("_s4"),
        )
    )
    nd = F.col("n").cast("double")
    mq = F.col("_s1").cast("double") / nd
    r2 = F.col("_s2").cast("double") / nd
    r3 = F.col("_s3").cast("double") / nd
    r4 = F.col("_s4").cast("double") / nd
    m2 = r2 - mq * mq
    m3 = r3 - F.lit(3.0) * mq * r2 + F.lit(2.0) * mq * mq * mq
    m4 = (
        r4
        - F.lit(4.0) * mq * r3
        + F.lit(6.0) * mq * mq * r2
        - F.lit(3.0) * mq * mq * mq * mq
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = nd / F.lit(6.0) * (
        skew * skew + kurt * kurt / F.lit(4.0)
    )
    ok = (F.col("n") >= 2) & (m2 > 0.0)
    return agg.select(
        *by,
        "n",
        (mq / F.lit(float(10**scale))).alias("mean"),
        F.when(ok, skew).alias("skew"),
        F.when(ok, kurt).alias("ex_kurt"),
        F.when(ok, jb).alias("jb"),
    )


def yuen_ttest(
    df: DataFrame,
    by: list[str],
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    trim_pct: int = 20,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n_a, n_b, h_a, h_b, tmean_a, tmean_b, t, df_y)`` —
    Yuen's trimmed-mean t-test (L320, Yuen 1974): the robust Welch
    (L139) — compare g%-trimmed means with winsorized variances, so a
    handful of outliers cannot buy or kill significance:

        g = ⌊n·trim/100⌋,  h = n − 2g
        t = (x̄ₜ_A − x̄ₜ_B) / sqrt(d_A + d_B),
        d = s²_w·(n−1) / (h·(h−1))

    (s²_w = winsorized sample variance; Welch-Satterthwaite df over
    the d's).  EXACT trick: the winsorized sums follow from the
    TRIMMED sums in closed form — Σwₓ = Σ_mid x + g·(lo + hi),
    Σwₓ² likewise — so ONE ranked pass per side suffices: positional
    boundaries lo = x₍g+1₎, hi = x₍n−g₎ are order statistics, the
    mid-range sums are exact decimals, and no second winsorize scan
    ever runs.  Boundary ties are value-deterministic.  h < 2 either
    side, or zero pooled d → NULL t.

    Scale shape: one keyed window pass + two combinable aggs.

    No reference counterpart; robust A/B analytics per SURVEY §2.11.
    """
    if not 0 < int(trim_pct) < 50:
        raise ValueError("yuen_ttest: trim_pct must be in 1..49")
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    )
    wt = Window.partitionBy(*by, group_col).orderBy(value_col)
    wa_ = Window.partitionBy(*by, group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # (18,s) so the x*x products stay exact (a (38,s) upcast caps
    # the product scale and rounds)
    ranked = flt.select(
        *by,
        F.col(group_col).alias("_g"),
        F.col(value_col).cast(dec).alias("_x"),
        F.row_number().over(wt).alias("_r"),
        F.count(F.lit(1)).over(wa_).alias("_n"),
    )
    g = F.floor(F.col("_n") * F.lit(int(trim_pct)) / F.lit(100))
    in_mid = (F.col("_r") > g) & (F.col("_r") <= F.col("_n") - g)
    side = ranked.groupBy(*by, "_g").agg(
        F.max("_n").alias("_nn"),
        F.sum(F.when(in_mid, F.col("_x"))).alias("_ts"),
        F.sum(F.when(in_mid, F.col("_x") * F.col("_x"))).alias("_tq"),
        F.max(F.when(F.col("_r") == g + 1, F.col("_x"))).alias("_lo"),
        F.max(
            F.when(F.col("_r") == F.col("_n") - g, F.col("_x"))
        ).alias("_hi"),
    )

    def sided(name):
        pick = lambda c: F.max(
            F.when(F.col("_g") == name, F.col(c))
        )
        return pick

    pa, pb = sided(group_a), sided(group_b)
    agg = side.groupBy(*by).agg(
        pa("_nn").alias("_na"),
        pa("_ts").alias("_tsa"),
        pa("_tq").alias("_tqa"),
        pa("_lo").alias("_loa"),
        pa("_hi").alias("_hia"),
        pb("_nn").alias("_nb"),
        pb("_ts").alias("_tsb"),
        pb("_tq").alias("_tqb"),
        pb("_lo").alias("_lob"),
        pb("_hi").alias("_hib"),
    )

    def stats(nn, ts, tq, lo, hi):
        nd = F.col(nn).cast("double")
        gg = F.floor(F.col(nn) * F.lit(int(trim_pct)) / F.lit(100))
        gd = gg.cast("double")
        hd = nd - F.lit(2.0) * gd
        lod = F.col(lo).cast("double")
        hid = F.col(hi).cast("double")
        tsd = F.col(ts).cast("double")
        tqd = F.col(tq).cast("double")
        wsum = tsd + gd * (lod + hid)
        wss = tqd + gd * (lod * lod + hid * hid)
        s2w = (nd * wss - wsum * wsum) / (nd * (nd - F.lit(1.0)))
        tmean = tsd / hd
        d = s2w * (nd - F.lit(1.0)) / (hd * (hd - F.lit(1.0)))
        return hd, tmean, d

    ha, tma, da = stats("_na", "_tsa", "_tqa", "_loa", "_hia")
    hb, tmb, db = stats("_nb", "_tsb", "_tqb", "_lob", "_hib")
    pooled = da + db
    t = (tma - tmb) / F.sqrt(pooled)
    dfy = (pooled * pooled) / (
        da * da / (ha - F.lit(1.0)) + db * db / (hb - F.lit(1.0))
    )
    ok = (
        F.col("_na").isNotNull()
        & F.col("_nb").isNotNull()
        & (ha >= 2.0)
        & (hb >= 2.0)
    )
    ok_t = ok & (pooled > 0.0)
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.when(ok, ha).alias("h_a"),
        F.when(ok, hb).alias("h_b"),
        F.when(ok, tma).alias("tmean_a"),
        F.when(ok, tmb).alias("tmean_b"),
        F.when(ok_t, t).alias("t"),
        F.when(ok_t, dfy).alias("df_y"),
    )


def twoway_anova_balanced(
    df: DataFrame,
    by: list[str],
    factor_a_col: str,
    factor_b_col: str,
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, r, c, m, f_a, f_b, f_ab, df_a, df_b, df_ab,
    df_e)`` — BALANCED two-way ANOVA with interaction (L336): do two
    factors move the metric, and do they INTERACT (the effect of one
    depends on the other) — the design the one-way test (L201-era
    ``oneway_anova``) cannot see:

        SS_A = m·c·Σ(ȳ_a − ȳ)²,  SS_B = m·r·Σ(ȳ_b − ȳ)²
        SS_AB = m·Σ(ȳ_ab − ȳ_a − ȳ_b + ȳ)²,  SS_E = Σ(y − ȳ_ab)²
        F = MS_effect / MS_E

    The closed-form partition REQUIRES equal cell sizes m — unequal
    cells are REFUSED loudly (unbalanced designs need the regression
    route).  Cell/margin sums are exact decimals; every SS folds over
    the bounded sorted cell grid (the L140 discipline); SS_E comes
    from the exact identity SS_E = SS_total − m·Σ(ȳ_ab − ȳ)².
    m < 2 (no residual df) or zero SS_E → NULL F's.

    Scale shape: one combinable (keys, a, b) cell agg + bounded folds.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(factor_a_col).isNotNull()
        & F.col(factor_b_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    cells = flt.groupBy(
        *by,
        F.col(factor_a_col).alias("_a"),
        F.col(factor_b_col).alias("_b"),
    ).agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_q"),
    )
    if validation_enabled():
        unbalanced = (
            cells.groupBy(*by)
            .agg((F.max("_m") != F.min("_m")).alias("_u"))
            .filter(F.col("_u"))
            .count()
        )
        if unbalanced:
            raise ValueError(
                "twoway_anova_balanced: unequal cell sizes — the "
                "closed-form partition needs a balanced design; use the "
                "regression route for unbalanced data"
            )
    packed = cells.groupBy(*by).agg(
        F.max("_m").alias("m"),
        F.countDistinct("_a").alias("r"),
        F.countDistinct("_b").alias("c"),
        F.sum("_s").alias("_ts"),
        F.sum("_q").alias("_tq"),
        F.sum("_m").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("_a", "_b", "_s"))
        ).alias("_lv"),
    )
    md = F.col("m").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("c").cast("double")
    nd = F.col("n").cast("double")
    gbar = F.col("_ts").cast("double") / nd

    def asum(e):  # row-margin sum for e's a level
        return F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a2, o: a2
            + F.when(
                o["_a"] == e["_a"], o["_s"].cast("double")
            ).otherwise(F.lit(0.0)),
        )

    def bsum(e):
        return F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a2, o: a2
            + F.when(
                o["_b"] == e["_b"], o["_s"].cast("double")
            ).otherwise(F.lit(0.0)),
        )

    # SS_A over distinct a levels: fold cells but divide by c (each
    # a level appears in c cells)
    ss_a = (
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a2, e: a2
            + (asum(e) / (md * cd) - gbar)
            * (asum(e) / (md * cd) - gbar),
        )
        / cd
        * (md * cd)
    )
    ss_b = (
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a2, e: a2
            + (bsum(e) / (md * rd) - gbar)
            * (bsum(e) / (md * rd) - gbar),
        )
        / rd
        * (md * rd)
    )
    ss_cells = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a2, e: a2
        + (e["_s"].cast("double") / md - gbar)
        * (e["_s"].cast("double") / md - gbar),
    ) * md
    ss_ab_terms = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a2, e: a2
        + (
            e["_s"].cast("double") / md
            - asum(e) / (md * cd)
            - bsum(e) / (md * rd)
            + gbar
        )
        * (
            e["_s"].cast("double") / md
            - asum(e) / (md * cd)
            - bsum(e) / (md * rd)
            + gbar
        ),
    ) * md
    ss_tot = F.col("_tq").cast("double") - nd * gbar * gbar
    s1 = packed.select(
        *by,
        "n",
        "r",
        "c",
        "m",
        ss_a.alias("_ssa"),
        ss_b.alias("_ssb"),
        ss_ab_terms.alias("_ssab"),
        (ss_tot - ss_cells).alias("_sse"),
    )
    df_a = (F.col("r") - 1).cast("double")
    df_b = (F.col("c") - 1).cast("double")
    df_ab = df_a * df_b
    df_e = (
        F.col("n") - F.col("r") * F.col("c")
    ).cast("double")
    mse = F.col("_sse") / df_e
    ok = (F.col("m") >= 2) & (F.col("r") >= 2) & (
        F.col("c") >= 2
    )
    ok_f = ok & (F.col("_sse") > 0.0)
    return s1.select(
        *by,
        "n",
        "r",
        "c",
        "m",
        F.when(ok_f, F.col("_ssa") / df_a / mse).alias("f_a"),
        F.when(ok_f, F.col("_ssb") / df_b / mse).alias("f_b"),
        F.when(ok_f, F.col("_ssab") / df_ab / mse).alias("f_ab"),
        F.when(ok, df_a).alias("df_a"),
        F.when(ok, df_b).alias("df_b"),
        F.when(ok, df_ab).alias("df_ab"),
        F.when(ok, df_e).alias("df_e"),
    )


def srm_check(
    df: DataFrame,
    by: list[str],
    arm_col: str,
    expected: dict[str, float],
) -> DataFrame:
    """``(by..., n, chi2, dof)`` — sample-ratio-mismatch check (L351):
    the chi-square goodness-of-fit of observed arm counts against the
    PLANNED allocation — the first gate every experiment readout must
    pass, because a skewed split means assignment itself is broken
    and every downstream metric is poisoned:

        χ² = Σ_a (O_a − n·w_a)² / (n·w_a),   dof = |arms| − 1

    (compare vs 3.841 at 5% for a 50/50 split; SRM practice uses a
    much stricter 0.001 gate ⇒ 10.83).  Arm counts are exact
    conditional sums pivoted in ONE combinable agg; the fold over
    arms runs in sorted-arm order with literal weights — one fixed
    IEEE tree.  Weights must be positive and sum to 1 (1e-9); arms
    OBSERVED but not planned are refused loudly (they are the bug,
    not a zero-weight cell).

    Scale shape: one combinable agg — one scan, no window.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    if not expected:
        raise ValueError("srm_check: expected must be non-empty")
    if any(w <= 0.0 for w in expected.values()):
        raise ValueError("srm_check: weights must be > 0")
    tot = sum(expected.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(
            f"srm_check: weights must sum to 1, got {tot!r}"
        )
    arms = sorted(expected)
    if validation_enabled():
        unknown = (
            df.select(F.col(arm_col).alias("_a"))
            .filter(~F.col("_a").isin(arms) | F.col("_a").isNull())
            .distinct()
            .limit(10)
            .collect()
        )
        if unknown:
            raise ValueError(
                "srm_check: observed arm(s) not in the planned allocation: "
                f"{sorted(str(r['_a']) for r in unknown)} — fix assignment "
                "or the expected map"
            )
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.col(arm_col) == a, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"_o{i}")
            for i, a in enumerate(arms)
        ],
    )
    nd = F.col("n").cast("double")
    chi2 = None
    for i, a in enumerate(arms):
        od = F.col(f"_o{i}").cast("double")
        e = nd * F.lit(float(expected[a]))
        d = od - e
        term = d * d / e
        chi2 = term if chi2 is None else chi2 + term
    return agg.select(
        *by,
        "n",
        F.when(F.col("n") > 0, chi2).alias("chi2"),
        F.lit(len(arms) - 1).alias("dof"),
    )


def dagostino_k2(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, z_skew, z_kurt, k2)`` — D'Agostino-Pearson K²
    omnibus normality test (L352): the small-sample-honest companion
    to Jarque-Bera (L266) — JB compares g₁/g₂ against their
    ASYMPTOTIC variances (badly anti-conservative under n ≈ 100),
    while K² normalizes each through its exact finite-n sampling
    law (D'Agostino 1970 skewness transform; Anscombe-Glynn 1983
    kurtosis transform):

        Z₁ = δ·asinh(Y/α)            (Y = scaled g₁)
        Z₂ = cube-root Wilson-Hilferty of b₂
        K² = Z₁² + Z₂²               (χ² df 2;  5% ⇒ 5.991)

    Power sums ride the L266 exact integer micro-unit trick
    (DECIMAL(38,0), order-insensitive, combinable); every transform
    constant is an n-polynomial — one fixed IEEE tree per group.
    n < 8 (the transforms' validity floor) or zero variance → NULL.

    Scale shape: ONE combinable aggregation — one scan of 100 TB.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    q = (
        (F.col(value_col).cast(dec) * F.lit(10**scale))
        .cast("decimal(38,0)")
    )
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .select(*by, q.alias("_q"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_q").alias("_s1"),
            F.sum(F.col("_q") * F.col("_q")).alias("_s2"),
            F.sum(F.col("_q") * F.col("_q") * F.col("_q")).alias("_s3"),
            F.sum(
                F.col("_q") * F.col("_q") * F.col("_q") * F.col("_q")
            ).alias("_s4"),
        )
    )
    nd = F.col("n").cast("double")
    mq = F.col("_s1").cast("double") / nd
    r2 = F.col("_s2").cast("double") / nd
    r3 = F.col("_s3").cast("double") / nd
    r4 = F.col("_s4").cast("double") / nd
    m2 = r2 - mq * mq
    m3 = r3 - F.lit(3.0) * mq * r2 + F.lit(2.0) * mq * mq * mq
    m4 = (
        r4
        - F.lit(4.0) * mq * r3
        + F.lit(6.0) * mq * mq * r2
        - F.lit(3.0) * mq * mq * mq * mq
    )
    g1 = m3 / (m2 * F.sqrt(m2))
    b2 = m4 / (m2 * m2)
    one, two, three = F.lit(1.0), F.lit(2.0), F.lit(3.0)
    # --- D'Agostino (1970) skewness transform ---
    y = g1 * F.sqrt(
        (nd + one) * (nd + three) / (F.lit(6.0) * (nd - two))
    )
    beta2 = (
        three
        * (nd * nd + F.lit(27.0) * nd - F.lit(70.0))
        * (nd + one)
        * (nd + three)
        / (
            (nd - two)
            * (nd + F.lit(5.0))
            * (nd + F.lit(7.0))
            * (nd + F.lit(9.0))
        )
    )
    w2 = F.sqrt(two * (beta2 - one)) - one
    delta = one / F.sqrt(F.log(F.sqrt(w2)))
    alpha = F.sqrt(two / (w2 - one))
    z1 = delta * F.log(
        y / alpha + F.sqrt((y / alpha) * (y / alpha) + one)
    )
    # --- Anscombe-Glynn (1983) kurtosis transform ---
    eb2 = three * (nd - one) / (nd + one)
    vb2 = (
        F.lit(24.0)
        * nd
        * (nd - two)
        * (nd - three)
        / (
            (nd + one)
            * (nd + one)
            * (nd + three)
            * (nd + F.lit(5.0))
        )
    )
    x = (b2 - eb2) / F.sqrt(vb2)
    sqbeta1 = (
        F.lit(6.0)
        * (nd * nd - F.lit(5.0) * nd + two)
        / ((nd + F.lit(7.0)) * (nd + F.lit(9.0)))
        * F.sqrt(
            F.lit(6.0)
            * (nd + three)
            * (nd + F.lit(5.0))
            / (nd * (nd - two) * (nd - three))
        )
    )
    a = F.lit(6.0) + F.lit(8.0) / sqbeta1 * (
        two / sqbeta1 + F.sqrt(one + F.lit(4.0) / (sqbeta1 * sqbeta1))
    )
    z2 = (
        (one - two / (F.lit(9.0) * a))
        - F.cbrt(
            (one - two / a)
            / (one + x * F.sqrt(two / (a - F.lit(4.0))))
        )
    ) / F.sqrt(two / (F.lit(9.0) * a))
    ok = (F.col("n") >= 8) & (m2 > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok, z1).alias("z_skew"),
        F.when(ok, z2).alias("z_kurt"),
        F.when(ok, z1 * z1 + z2 * z2).alias("k2"),
    )


# ln(1 + 1e-7): the R fisher.test tolerance for "PMF(k) <= PMF(obs)",
# pinned as a literal so both engines add the same double.
_FISHER_LN_TOL = 9.999999505838704e-08


def fisher_exact(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    max_support: int = 20_000,
) -> DataFrame:
    """``(by..., a, b, c, d, odds_ratio, p_two)`` — Fisher's exact
    test (L365) on the 2x2 table of two binary columns per key: the
    small-cell companion L140's chi-squared approximation cannot
    serve (any expected cell < 5 and the asymptotics are off — the
    regime of rare-event audits and sliced experiment readouts):

        a = #(x=1,y=1)  b = #(x=1,y=0)  c = #(0,1)  d = #(0,0)
        P(k) = C(r1,k)*C(r2,c1-k) / C(n,c1)   (hypergeometric, fixed
                                               margins r1, r2, c1)
        p_two = sum of P(k) over k with P(k) <= P(a)*(1+1e-7)

    Factorials overflow anything exact, so the PMF support is walked
    in LOG space: lw(kmin) = 0 and lw(k) = lw(k-1) + ln of ONE
    division of two double products — a deterministic left fold in
    ascending-k order (the L333 fold discipline), then numerator and
    denominator are folds of exp(lw - lw_max) in the SAME order, so
    the whole p-value is one pinned IEEE tree per key (the oracle
    walks the identical recurrence via recursive CTE + ORDER BY k
    list folds).  Degenerate margins (zero row/column) collapse the
    support to one point and p_two = 1 by construction.  The sample
    odds ratio a*d/(b*c) is NULL when b*c = 0 (infinite/undefined).

    Support width min(r1,c1) - max(0,c1-r2) + 1 is bounded by the
    smaller margin; beyond ``max_support`` the walk is refused loudly
    — at that size chi-squared (L140) is the right tool, and the
    refusal names it.  x/y must be 0/1; NULLs refused.

    Scale shape: one combinable agg (four conditional sums) + a
    bounded per-key fold — one scan of 100 TB, no window, no join.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(x_col).isNull() | F.col(y_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"fisher_exact: {n_null} NULL value(s) in x/y")
    if validation_enabled():
        n_bad = df.filter(
            ~F.col(x_col).cast("int").isin(0, 1)
            | ~F.col(y_col).cast("int").isin(0, 1)
        ).count()
        if n_bad:
            raise ValueError(f"fisher_exact: {n_bad} non-0/1 x/y value(s)")

    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    one = F.lit(1).cast("long")
    agg = df.groupBy(*by).agg(
        F.sum(x * y).alias("a"),
        F.sum(x * (one - y)).alias("b"),
        F.sum((one - x) * y).alias("c"),
        F.sum((one - x) * (one - y)).alias("d"),
    )
    r1 = F.col("a") + F.col("b")
    r2 = F.col("c") + F.col("d")
    c1 = F.col("a") + F.col("c")
    staged = agg.select(
        *by,
        "a",
        "b",
        "c",
        "d",
        F.greatest(F.lit(0).cast("long"), c1 - r2).alias("_kmin"),
        F.least(r1, c1).alias("_kmax"),
        r1.alias("_r1"),
        r2.alias("_r2"),
        c1.alias("_c1"),
    )
    if validation_enabled():
        wide = (
            staged.filter(
                F.col("_kmax") - F.col("_kmin") + 1 > max_support
            )
            .limit(5)
            .collect()
        )
        if wide:
            raise ValueError(
                "fisher_exact: hypergeometric support width exceeds "
                f"max_support={max_support} — at this cell size the exact "
                "walk buys nothing; use chi_squared (L140)"
            )

    ks = F.when(
        F.col("_kmax") > F.col("_kmin"),
        F.sequence(F.col("_kmin") + 1, F.col("_kmax")),
    ).otherwise(F.array().cast("array<long>"))

    def _step(acc, k):
        num = (F.col("_r1") - k + 1).cast("double") * (
            F.col("_c1") - k + 1
        ).cast("double")
        den = k.cast("double") * (
            F.col("_r2") - F.col("_c1") + k
        ).cast("double")
        return F.concat(
            acc,
            F.array(F.element_at(acc, F.size(acc)) + F.log(num / den)),
        )

    lws = F.aggregate(ks, F.array(F.lit(0.0)), _step)
    s1 = staged.select(
        *by, "a", "b", "c", "d", "_kmin", lws.alias("_lws")
    )
    lobs = F.element_at(
        F.col("_lws"), (F.col("a") - F.col("_kmin") + 1).cast("int")
    )
    s2 = s1.select(
        *by,
        "a",
        "b",
        "c",
        "d",
        "_lws",
        F.array_max(F.col("_lws")).alias("_lmax"),
        (lobs + F.lit(_FISHER_LN_TOL)).alias("_lcut"),
    )
    denom = F.aggregate(
        F.col("_lws"),
        F.lit(0.0),
        lambda acc, lw: acc + F.exp(lw - F.col("_lmax")),
    )
    numer = F.aggregate(
        F.col("_lws"),
        F.lit(0.0),
        lambda acc, lw: acc
        + F.when(
            lw <= F.col("_lcut"), F.exp(lw - F.col("_lmax"))
        ).otherwise(F.lit(0.0)),
    )
    ad = F.col("a").cast("double") * F.col("d").cast("double")
    bc = F.col("b").cast("double") * F.col("c").cast("double")
    return s2.select(
        *by,
        "a",
        "b",
        "c",
        "d",
        F.when((F.col("b") > 0) & (F.col("c") > 0), ad / bc).alias(
            "odds_ratio"
        ),
        F.least(numer / denom, F.lit(1.0)).alias("p_two"),
    )


def welch_anova(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., k, n, f, df2)`` — Welch's heteroskedastic one-way
    ANOVA (L367): the k-group mean comparison that does NOT assume
    equal variances — the k-sample generalization of L139's Welch t
    and the test to reach for when L193 (Brown-Forsythe) says the
    spreads differ, where the classic L215 F is anticonservative:

        w_j = n_j/s_j²,  x̄w = Σw_j·m_j / Σw_j
        A   = Σ w_j(m_j − x̄w)²
        B   = Σ (1 − w_j/W)²/(n_j − 1)
        F*  = (A/(k−1)) / (1 + 2(k−2)/(k²−1)·B),  df2 = (k²−1)/(3B)

    (Welch 1951).  Per level the exact DECIMAL sufficient statistics
    (n_j, Σv, Σv²) aggregate combinably; W, Σw·m, A and B are the
    repo's sorted-level ordered folds — each term a fixed IEEE tree,
    bit-identical, ungridded.  k < 2, any n_j < 2, or any s_j² ≤ 0
    → NULL f/df2 (weights undefined).  df1 = k−1 is implied by k.

    Scale shape: ONE combinable groupBy; folds over k-length arrays.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    vd = F.col(value_col).cast(dec)
    per = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .groupBy(*by, F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(vd).alias("_s"),
            F.sum(vd * vd).alias("_q"),
        )
    )
    arr = per.groupBy(*by).agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_g").alias("g"),
                    F.col("_n").cast("double").alias("njd"),
                    F.col("_s").cast("double").alias("sd"),
                    F.col("_q").cast("double").alias("qd"),
                )
            )
        ).alias("_lv"),
    )

    def _var(v):
        return (v["qd"] - v["sd"] * v["sd"] / v["njd"]) / (
            v["njd"] - F.lit(1.0)
        )

    def _w(v):
        return v["njd"] / _var(v)

    big_w = F.aggregate(
        F.col("_lv"), F.lit(0.0), lambda acc, v: acc + _w(v)
    )
    swm = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc + _w(v) * (v["sd"] / v["njd"]),
    )
    ok = (
        (F.col("k") >= 2)
        & (
            F.array_min(
                F.transform(F.col("_lv"), lambda v: v["njd"])
            )
            >= 2.0
        )
        & (
            F.array_min(F.transform(F.col("_lv"), _var)) > 0.0
        )
    )
    s1 = arr.select(
        *by,
        "k",
        "n",
        "_lv",
        F.when(ok, big_w).alias("_W"),
        F.when(ok, swm).alias("_swm"),
    )
    xw = F.col("_swm") / F.col("_W")
    s2 = s1.select(*by, "k", "n", "_lv", "_W", xw.alias("_xw"))
    a_stat = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + _w(v)
        * (v["sd"] / v["njd"] - F.col("_xw"))
        * (v["sd"] / v["njd"] - F.col("_xw")),
    )
    b_stat = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (F.lit(1.0) - _w(v) / F.col("_W"))
        * (F.lit(1.0) - _w(v) / F.col("_W"))
        / (v["njd"] - F.lit(1.0)),
    )
    s3 = s2.select(
        *by,
        "k",
        "n",
        F.when(F.col("_xw").isNotNull(), a_stat).alias("_A"),
        F.when(F.col("_xw").isNotNull(), b_stat).alias("_B"),
    )
    kd = F.col("k").cast("double")
    f = (F.col("_A") / (kd - F.lit(1.0))) / (
        F.lit(1.0)
        + F.lit(2.0) * (kd - F.lit(2.0)) / (kd * kd - F.lit(1.0))
        * F.col("_B")
    )
    df2 = (kd * kd - F.lit(1.0)) / (F.lit(3.0) * F.col("_B"))
    return s3.select(*by, "k", "n", f.alias("f"), df2.alias("df2"))


def games_howell(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., g_a, g_b, n_a, n_b, mean_a, mean_b, t, df_gh, q)`` —
    Games-Howell post-hoc pairs (L368): WHICH means differ after
    L367's Welch ANOVA rejects — the unequal-variance upgrade of
    Tukey-Kramer (L256, which pools a single MSW and is wrecked by
    heteroskedastic groups):

        se²  = s_a²/n_a + s_b²/n_b
        t    = (m_a − m_b)/√se²
        df   = se⁴ / ((s_a²/n_a)²/(n_a−1) + (s_b²/n_b)²/(n_b−1))
        q    = √2·t      (compare |q| to the studentized-range
                          critical value at (k, df); p-values are
                          deliberately not emitted — L139 discipline)

    Per-level exact DECIMAL sufficient statistics; each pair is one
    fixed IEEE tree; pairs emitted once with g_a < g_b.  Either side
    with n < 2 or s² ≤ 0 → NULL t/df_gh/q.

    Scale shape: one combinable (keys, level) groupBy + a bounded
    k×k pair join — the L256 shape with per-side variances.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    xd = F.col(value_col).cast(dec)
    per = flt.groupBy(*by, F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(xd).alias("_s"),
        F.sum(xd * xd).alias("_q"),
    )
    a = per.select(
        *by,
        F.col("_g").alias("g_a"),
        F.col("_nj").alias("n_a"),
        F.col("_s").alias("_sa"),
        F.col("_q").alias("_qa"),
    )
    b = per.select(
        *by,
        F.col("_g").alias("g_b"),
        F.col("_nj").alias("n_b"),
        F.col("_s").alias("_sb"),
        F.col("_q").alias("_qb"),
    )
    pairs = (a.join(b, [*by]) if by else a.crossJoin(b)).filter(
        F.col("g_a") < F.col("g_b")
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    sa = F.col("_sa").cast("double")
    sb = F.col("_sb").cast("double")
    qa = F.col("_qa").cast("double")
    qb = F.col("_qb").cast("double")
    ma = sa / nad
    mb = sb / nbd
    va = (qa - sa * sa / nad) / (nad - F.lit(1.0))
    vb = (qb - sb * sb / nbd) / (nbd - F.lit(1.0))
    sea = va / nad
    seb = vb / nbd
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    df_gh = (
        se2
        * se2
        / (
            sea * sea / (nad - F.lit(1.0))
            + seb * seb / (nbd - F.lit(1.0))
        )
    )
    ok = (
        (F.col("n_a") >= 2)
        & (F.col("n_b") >= 2)
        & (va > 0.0)
        & (vb > 0.0)
    )
    return pairs.select(
        *by,
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        F.when(ok, t).alias("t"),
        F.when(ok, df_gh).alias("df_gh"),
        F.when(ok, F.sqrt(F.lit(2.0)) * t).alias("q"),
    )
