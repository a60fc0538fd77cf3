"""Rank-based evaluation statistics (L146/L147): ROC-AUC via the
Mann-Whitney U statistic and the exact two-sample Kolmogorov-Smirnov
distance — the classifier-evaluation and distribution-drift workhorses,
re-expressed so every intermediate is EXACT integer/decimal arithmetic
and the only IEEE operation is one final division.

L146 — ROC-AUC (Mann-Whitney): AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻).
With average-rank tie handling, U = R⁺ − n⁺(n⁺+1)/2 where R⁺ is the
sum of average ranks of positives under ascending score order.  Ranks
are rationals with denominator 2, so DOUBLED rank sums are integers:
for a tie group of ``cnt`` rows starting after ``before`` rows,
2·avg_rank = 2·before + cnt + 1, hence

    2·R⁺ = Σ_groups pos_cnt · (2·before + cnt + 1)        (exact int)
    AUC  = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻)                  (one division)

L147 — two-sample KS: D = max_x |F_a(x) − F_b(x)|.  At each distinct
value, |cum_a·n_b − cum_b·n_a| is an exact integer; D is the max of
those over n_a·n_b — again one division at the very end.

Exactness: sums run in DECIMAL(38,0) (order-insensitive, combinable,
no 64-bit overflow at 10¹² rows where rank·count products reach
10²⁴); the single final divide of exactly-representable integers is
correctly rounded by IEEE, so both statistics are bit-identical across
engines and parallelism — NO grid.

Scale shape: one combinable groupBy per (keys, value) — the distinct-
value table is ≤ input and usually far smaller; ONE window pass per
group ordered by value (a single keyed exchange; the sort is the
semantics); one final combinable agg.  A 100 TB fact table is scanned
once; no collect, no crossJoin.

No reference counterpart; model-evaluation analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_DEC = "decimal(38,0)"


def roc_auc(
    df: DataFrame,
    by: list[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """``(by..., n_pos, n_neg, u, auc)`` — average-rank-tied ROC-AUC
    per group.  ``label_col`` must be 0/1 (cast to int); NULL labels
    or scores are ignored.  Groups missing a class yield NULL u/auc."""
    lab = F.col(label_col).cast("int")
    pts = (
        df.filter(F.col(label_col).isNotNull() & F.col(score_col).isNotNull())
        .groupBy(*by, F.col(score_col).alias("_s"))
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(lab).alias("_pos"),
        )
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn("_before", F.coalesce(F.sum("_cnt").over(w), F.lit(0)))
    # doubled average rank of the tie group, an exact integer
    two_rank = (
        F.lit(2) * F.col("_before") + F.col("_cnt") + F.lit(1)
    ).cast(_DEC)
    agg = pts.groupBy(*by).agg(
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_cnt") - F.col("_pos")).alias("n_neg"),
        F.sum(F.col("_pos").cast(_DEC) * two_rank).alias("_2rpos"),
    )
    np_, nn = F.col("n_pos").cast(_DEC), F.col("n_neg").cast(_DEC)
    u2 = F.col("_2rpos") - np_ * (np_ + F.lit(1).cast(_DEC))  # = 2·U
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        F.when(ok, u2.cast("double") / F.lit(2.0)).alias("u"),
        F.when(
            ok,
            u2.cast("double") / (F.lit(2).cast(_DEC) * np_ * nn).cast("double"),
        ).alias("auc"),
    )


def ks_2samp(
    df: DataFrame,
    by: list[str],
    sample_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, d)`` — exact two-sample KS distance per
    group: max_x |F_a(x) − F_b(x)| over the pooled distinct values.
    Rows of other samples are ignored; a group missing either sample
    yields NULL d."""
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(sample_col).isin([sample_a, sample_b])
    )
    is_a = (F.col(sample_col) == sample_a).cast("long")
    pts = flt.groupBy(*by, F.col(value_col).alias("_v")).agg(
        F.sum(is_a).alias("_ca"),
        F.sum(F.lit(1) - is_a).alias("_cb"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*by)
    pts = (
        pts.withColumn("_cuma", F.sum("_ca").over(w))
        .withColumn("_cumb", F.sum("_cb").over(w))
        .withColumn("_na", F.sum("_ca").over(tot))
        .withColumn("_nb", F.sum("_cb").over(tot))
    )
    gap = F.abs(
        F.col("_cuma").cast(_DEC) * F.col("_nb").cast(_DEC)
        - F.col("_cumb").cast(_DEC) * F.col("_na").cast(_DEC)
    )
    agg = pts.groupBy(*by).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max(gap).alias("_maxgap"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            ok,
            F.col("_maxgap").cast("double")
            / (F.col("n_a").cast(_DEC) * F.col("n_b").cast(_DEC)).cast(
                "double"
            ),
        ).alias("d"),
    )


def weighted_quantiles(
    df: DataFrame,
    by: list[str],
    value_col: str,
    weight_col: str,
    qs: list[str],
    scale: int = 2,
) -> DataFrame:
    """``(by..., q, value)`` — lower weighted quantiles: the smallest
    value whose cumulative weight reaches q·W.  ``qs`` are decimal
    STRINGS ("0.5") so the threshold comparison cumW ≥ q·W is exact
    decimal arithmetic — no float boundary wobble on exact-hit
    quantiles.  Weights must be non-negative decimals (refused
    otherwise); NULL values/weights ignored.  One keyed window sort +
    one combinable agg for ALL requested quantiles."""
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    ).select(*by, F.col(value_col).alias("_v"), F.col(weight_col).cast(dec).alias("_w"))
    if validation_enabled():
        n_neg = flt.filter(F.col("_w") < 0).count()
        if n_neg:
            raise ValueError(
                f"weighted_quantiles: {n_neg} negative weight(s) in "
                f"{weight_col!r} — weights must be non-negative"
            )
    w = (
        Window.partitionBy(*by)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*by)
    staged = flt.select(
        *by,
        "_v",
        F.sum("_w").over(w).alias("_cw"),
        F.sum("_w").over(tot).alias("_tw"),
    )
    picks = []
    for q in qs:
        q_dec = F.lit(q).cast("decimal(9,6)")
        thr = q_dec * F.col("_tw")
        picks.append(
            F.min(F.when(F.col("_cw") >= thr, F.col("_v"))).alias(f"_q{q}")
        )
    agg = staged.groupBy(*by).agg(*picks)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("q"), F.col(f"`_q{q}`").alias("value")
                )
                for q in qs
            ]
        )
    ).alias("_s")
    return agg.select(*by, stack).select(
        *by, F.col("_s.q").alias("q"), F.col("_s.value").alias("value")
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One row ``(n, n_groups, h, h_tie_corrected)`` — the k-sample
    rank ANOVA (Kruskal-Wallis).  Doubled average ranks keep every
    rank sum an exact integer (the L146 trick); the per-group
    R²/n terms and the tie correction fold over the BOUNDED sorted
    group/value lists, so H is a fixed IEEE tree — ungridded.  All
    values tied, or fewer than 2 groups → NULL.

    Scale note: the rank sweep is a single global window over the
    DISTINCT-VALUE grid — bucket/floor continuous values first so the
    grid stays bounded (the L159 discipline); the test's verdict is
    insensitive to reasonable bucketing."""
    flt = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    pts = flt.groupBy(
        F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy("_v").agg(F.sum("_c").alias("_cv"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    vals = vals.withColumn(
        "_before", F.coalesce(F.sum("_cv").over(w), F.lit(0))
    )
    two_rank = (
        F.lit(2) * F.col("_before") + F.col("_cv") + F.lit(1)
    ).cast(_DEC)
    per_group = (
        pts.join(vals, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_n_g"),
            F.sum(F.col("_c").cast(_DEC) * two_rank).alias("_r2"),
        )
    )
    # bounded folds: per-group R2²/(4n_g) terms, sorted by group
    garr = F.sort_array(
        F.collect_list(F.struct(F.col("_g"), F.col("_n_g"), F.col("_r2")))
    )
    gstats = per_group.agg(
        F.sum("_n_g").alias("n"),
        F.count(F.lit(1)).alias("n_groups"),
        F.aggregate(
            garr,
            F.lit(0.0),
            lambda a, s: a
            + (s["_r2"] * s["_r2"]).cast("double")
            / (F.lit(4).cast(_DEC) * s["_n_g"].cast(_DEC)).cast("double"),
        ).alias("_sr"),
    )
    tarr = F.sort_array(F.collect_list(F.struct(F.col("_v"), F.col("_cv"))))
    tstats = vals.agg(
        F.aggregate(
            tarr,
            F.lit(0.0),
            lambda a, s: a
            + (
                s["_cv"].cast(_DEC) * s["_cv"].cast(_DEC) * s["_cv"].cast(_DEC)
                - s["_cv"].cast(_DEC)
            ).cast("double"),
        ).alias("_tt")
    )
    j = gstats.crossJoin(F.broadcast(tstats))
    nd = F.col("n").cast("double")
    h = (F.lit(12.0) * F.col("_sr")) / (nd * (nd + F.lit(1.0))) - F.lit(
        3.0
    ) * (nd + F.lit(1.0))
    denom = F.lit(1.0) - F.col("_tt") / (nd * nd * nd - nd)
    ok = (F.col("n_groups") > 1) & (F.col("n") > 1) & (denom > 0.0)
    return j.select(
        "n",
        "n_groups",
        F.when(ok, h).alias("h"),
        F.when(ok, h / denom).alias("h_tie_corrected"),
    )


def wasserstein_1d(
    df: DataFrame,
    by: list[str],
    sample_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n_a, n_b, w1)`` — the exact 1-D Wasserstein-1 (earth
    mover's) distance between two samples: W₁ = ∫|F_a − F_b| dx, the
    INTEGRAL companion to the KS max-gap (L147) — KS sees the worst
    point, W₁ sees total transported mass, the drift metric that
    respects distance between values.

    Over the pooled sorted distinct values vᵢ with leads vᵢ₊₁:

        W₁ = Σᵢ |cumAᵢ·n_b − cumBᵢ·n_a| · (vᵢ₊₁ − vᵢ)  /  (n_a·n_b)

    Every numerator term is an exact decimal (integer gap × decimal
    width, values contract-quantized at DECIMAL(18, scale)), the sum
    is an order-insensitive decimal sum, and W₁ is ONE final IEEE
    division — bit-identical, no grid, no fold needed.  Same one-
    groupBy + one-window shape as L146/L147."""
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(sample_col).isin([sample_a, sample_b])
    )
    dec = f"decimal(18,{scale})"
    is_a = (F.col(sample_col) == sample_a).cast("long")
    pts = flt.groupBy(*by, F.col(value_col).cast(dec).alias("_v")).agg(
        F.sum(is_a).alias("_ca"),
        F.sum(F.lit(1) - is_a).alias("_cb"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ww = Window.partitionBy(*by).orderBy("_v")
    tot = Window.partitionBy(*by)
    pts = (
        pts.withColumn("_cuma", F.sum("_ca").over(w))
        .withColumn("_cumb", F.sum("_cb").over(w))
        .withColumn("_na", F.sum("_ca").over(tot))
        .withColumn("_nb", F.sum("_cb").over(tot))
        .withColumn("_nextv", F.lead("_v").over(ww))
    )
    gap = F.abs(
        F.col("_cuma").cast(_DEC) * F.col("_nb").cast(_DEC)
        - F.col("_cumb").cast(_DEC) * F.col("_na").cast(_DEC)
    ).cast("decimal(19,0)")
    # width keeps the value scale — a scale-0 cast would TRUNCATE
    # fractional widths (caught by the oracle on first run)
    width = (F.col("_nextv") - F.col("_v")).cast(f"decimal(19,{scale})")
    term = F.when(F.col("_nextv").isNotNull(), gap * width).otherwise(
        F.lit(0).cast(f"decimal(19,{scale})")
    )
    agg = pts.groupBy(*by).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(term).alias("_num"),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            ok,
            F.col("_num").cast("double")
            / (F.col("n_a").cast(_DEC) * F.col("n_b").cast(_DEC)).cast(
                "double"
            ),
        ).alias("w1"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, w_plus, z)`` — the Wilcoxon signed-rank test for
    PAIRED samples (the nonparametric companion to Welch's t, L139:
    same-row before/after or metric-vs-metric comparisons where the
    difference distribution is non-normal).

    Per group: d = x − y at DECIMAL(18, scale) (exact), zero
    differences dropped (Wilcoxon's original zero-handling), |d|
    ranked ascending with average ranks.  The L146 doubled-rank trick
    keeps every rank sum an exact integer:

        2·W⁺  = Σ_groups pos_cnt · (2·before + cnt + 1)    (exact int)
        E[2W⁺] = n(n+1)/2                                  (exact int)
        12·Var(2W⁺) = 2n(n+1)(2n+1) − Σ(t³−t)              (exact int)
        z = (2W⁺ − n(n+1)/2) / sqrt(12Var/12.0)            (fixed tree)

    so z is one subtraction, one division, one sqrt over exactly-
    representable integers — bit-identical, NO grid.  ``w_plus`` is
    2W⁺/2.0 (ties make W⁺ half-integral; the halving is exact in
    IEEE).  Groups need n ≥ 1 nonzero pairs to appear and Var > 0 for
    a non-NULL z (all-tied |d| still has Var > 0; only n = 0 drops).

    Scale shape: identical to L146/L174 — one combinable groupBy on
    (keys, |d|), ONE keyed window over the bounded distinct-|d| grid,
    one final combinable agg.  100 TB scans once; sums in
    DECIMAL(38,0) survive 10¹² rows.
    """
    dec = f"decimal(18,{scale})"
    d = F.col(x_col).cast(dec) - F.col(y_col).cast(dec)
    base = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*by, d.alias("_d"))
        .filter(F.col("_d") != 0)
        .select(
            *by,
            F.abs(F.col("_d")).alias("_a"),
            (F.col("_d") > 0).cast("long").alias("_pos"),
        )
    )
    pts = base.groupBy(*by, "_a").agg(
        F.count(F.lit(1)).alias("_cv"),
        F.sum("_pos").alias("_cpos"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_a")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn(
        "_bef", F.coalesce(F.sum("_cv").over(w), F.lit(0))
    )
    two_rank = (
        F.lit(2) * F.col("_bef") + F.col("_cv") + F.lit(1)
    ).cast(_DEC)
    cvd = F.col("_cv").cast(_DEC)
    agg = pts.groupBy(*by).agg(
        F.sum("_cv").alias("n"),
        F.sum(F.col("_cpos").cast(_DEC) * two_rank).alias("_w2"),
        F.sum(cvd * cvd * cvd - cvd).alias("_tt"),
    )
    nd = F.col("n").cast(_DEC)
    mu2 = (nd * (nd + 1) / 2).cast(_DEC)
    var12 = (
        F.lit(2).cast(_DEC) * nd * (nd + 1) * (2 * nd + 1) - F.col("_tt")
    ).cast(_DEC)
    z = (F.col("_w2") - mu2).cast("double") / F.sqrt(
        var12.cast("double") / F.lit(12.0)
    )
    return agg.select(
        *by,
        "n",
        (F.col("_w2").cast("double") / F.lit(2.0)).alias("w_plus"),
        F.when(var12 > 0, z).alias("z"),
    )


def friedman(
    df: DataFrame,
    by: list[str],
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., k, n_blocks, q)`` — the Friedman test for a
    RANDOMIZED COMPLETE BLOCK design (the k-treatment companion to
    Wilcoxon signed-rank, L189: within-subject comparisons of k
    variants where each block sees every treatment).

    Per group: duplicate (block, treatment) cells collapse with
    ``max`` (deterministic, documented); k = distinct treatments in
    the group; blocks with fewer than k cells drop (incomplete
    blocks — classical Friedman is defined on complete blocks only).
    Within each surviving block, values rank with average ranks.  The
    L146 doubled-rank trick keeps every intermediate an exact integer:
    for a tie group of ``eq`` cells whose cumulative count-through is
    ``cum``, 2·avg_rank = 2·cum − eq + 1, so with 2R_j = Σ_blocks 2r:

        Q = (k−1)·Σ_j (2R_j − n(k+1))² / (Σ_cells (2r)² − n·k·(k+1)²)

    — the tie-corrected Friedman statistic as ONE division of two
    exactly-representable DECIMAL integers (classical check: k=3,
    n=2, untied ranks → Q = 4 both ways).  Denominator 0 (all cells
    tied within every block) or k < 2 yields NULL q.

    Scale shape: one combinable cell groupBy; one (keys) agg + one
    (keys, block) agg joined back on their keys (both shuffles are
    combinable and co-partitioned); ONE keyed window over (keys,
    block) — blocks are tiny (k cells) but numerous, so the window
    partition key is high-cardinality and spreads evenly; one final
    combinable agg.  100 TB scans once; sums in DECIMAL(38,0) survive
    10¹² rows.
    """
    cell = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treat_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            *by,
            F.col(block_col).alias("_b"),
            F.col(treat_col).alias("_t"),
        )
        .agg(F.max(value_col).alias("_v"))
    )
    kdf = cell.groupBy(*by).agg(F.countDistinct("_t").alias("k"))
    bs = cell.groupBy(*by, "_b").agg(F.count(F.lit(1)).alias("_bc"))
    joined = cell.join(bs, [*by, "_b"])
    full = (
        joined.join(F.broadcast(kdf), list(by))
        if by
        else joined.crossJoin(F.broadcast(kdf))
    )
    full = full.filter((F.col("_bc") == F.col("k")) & (F.col("k") >= 2))
    wb = [*by, "_b"]
    w_cum = (
        Window.partitionBy(*wb)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_eq = Window.partitionBy(*wb, "_v")
    ranked = full.withColumn(
        "_2r",
        (
            F.lit(2) * F.count(F.lit(1)).over(w_cum)
            - F.count(F.lit(1)).over(w_eq)
            + F.lit(1)
        ).cast(_DEC),
    )
    # per-treatment doubled rank sums + per-group cell-level sums
    tr = ranked.groupBy(*by, "k", "_t").agg(
        F.sum("_2r").alias("_2rj"),
        F.sum(F.col("_2r") * F.col("_2r")).alias("_sq"),
        F.count(F.lit(1)).alias("_nb"),
    )
    kd = F.col("k").cast(_DEC)
    nd = F.col("n_blocks").cast(_DEC)
    agg = tr.groupBy(*by, "k").agg(
        F.max("_nb").alias("n_blocks"),
        F.sum("_sq").alias("_sumsq"),
        F.collect_list("_2rj").alias("_rjs"),
    )
    num = (kd - 1) * F.aggregate(
        F.transform(
            F.col("_rjs"),
            lambda r: (r.cast(_DEC) - nd * (kd + 1))
            * (r.cast(_DEC) - nd * (kd + 1)),
        ),
        F.lit(0).cast(_DEC),
        lambda acc, x: acc + x,
    )
    den = F.col("_sumsq") - nd * kd * (kd + 1) * (kd + 1)
    return agg.select(
        *by,
        "k",
        "n_blocks",
        F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).alias("q"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    by: list[str],
    group_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n, k, jt, z)`` — the Jonckheere-Terpstra test for an
    ORDERED alternative across k groups (dose-response / severity
    trends: Kruskal-Wallis, L174, asks "do groups differ"; JT asks
    "do values RISE with the group order", ordering groups by
    ``group_col``'s natural sort).

    JT = Σ_{i<j} [#(a < b) + ½·#(a = b)] over pairs a∈group_i,
    b∈group_j.  Doubled (the L189 discipline), over the bounded
    (group × distinct-value) grid — callers pre-bucket continuous
    values, the L174 convention:

        2·JT = Σ_{(g,v)} c_g(v) · (2·Σ_{i<g} LT_i(v) + Σ_{i<g} c_i(v))

    with LT_i(v) = #rows of group i below v — per-group value prefix
    (ONE keyed window), then a per-value group prefix (ONE more
    window over the k-bounded axis), every term an exact
    DECIMAL(38,0) integer.  The null mean and the tie-corrected
    variance (Hollander & Wolfe) are fixed IEEE trees over exact
    integer tie/group sums:

        E[JT]   = (n² − Σ n_i²)/4
        Var(JT) = A/72 + B/(36·n(n−1)(n−2)) + C/(8·n(n−1))

    (A, B, C the standard group-size / tie-count polynomials) — so
    jt and z are bit-identical across engines, NO grid beyond the
    caller's own value bucketing.  k < 2 or Var ≤ 0 yields NULL z.

    Scale shape: one combinable (keys, group, value) groupBy; the
    grid is (distinct groups × distinct values) per key — bounded —
    built with a broadcast cross join; two keyed windows over the
    grid; one final combinable agg.  100 TB scans once.
    """
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(*by, F.col(group_col).alias("_g"), F.col(value_col).alias("_v"))
    pts = base.groupBy(*by, "_g", "_v").agg(
        F.count(F.lit(1)).alias("_c")
    )
    dg = pts.select(*by, "_g").distinct()
    dv = pts.select(*by, "_v").distinct()
    grid = (
        dg.join(dv, list(by)) if by else dg.crossJoin(dv)
    ).join(pts, [*by, "_g", "_v"], "left").select(
        *by, "_g", "_v", F.coalesce(F.col("_c"), F.lit(0)).alias("_c")
    )
    w_val = (
        Window.partitionBy(*by, "_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn(
        "_lt", F.coalesce(F.sum("_c").over(w_val), F.lit(0))
    )
    w_grp = (
        Window.partitionBy(*by, "_v")
        .orderBy("_g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn(
        "_slt", F.coalesce(F.sum("_lt").over(w_grp), F.lit(0))
    ).withColumn(
        "_seq", F.coalesce(F.sum("_c").over(w_grp), F.lit(0))
    )
    cd = F.col("_c").cast(_DEC)
    jt2_term = cd * (
        F.lit(2).cast(_DEC) * F.col("_slt").cast(_DEC)
        + F.col("_seq").cast(_DEC)
    )
    # group-size and tie-count polynomials (exact integers)
    gi = pts.groupBy(*by, "_g").agg(F.sum("_c").alias("_ni"))
    nid = F.col("_ni").cast(_DEC)
    gstats = gi.groupBy(*by).agg(
        F.sum("_ni").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(nid * nid).alias("_sn2"),
        F.sum(nid * (nid - 1) * (2 * nid + 5)).alias("_sa_g"),
        F.sum(nid * (nid - 1) * (nid - 2)).alias("_sb_g"),
        F.sum(nid * (nid - 1)).alias("_sc_g"),
    )
    tv = pts.groupBy(*by, "_v").agg(F.sum("_c").alias("_tv"))
    tvd = F.col("_tv").cast(_DEC)
    tstats = tv.groupBy(*by).agg(
        F.sum(tvd * (tvd - 1) * (2 * tvd + 5)).alias("_sa_t"),
        F.sum(tvd * (tvd - 1) * (tvd - 2)).alias("_sb_t"),
        F.sum(tvd * (tvd - 1)).alias("_sc_t"),
    )
    jt2 = grid.groupBy(*by).agg(F.sum(jt2_term).alias("_jt2"))
    out = jt2
    for other in (gstats, tstats):
        out = out.join(other, list(by)) if by else out.crossJoin(other)
    nd = F.col("n").cast(_DEC)
    a_term = (
        nd * (nd - 1) * (2 * nd + 5) - F.col("_sa_g") - F.col("_sa_t")
    ).cast("double")
    b_term = (F.col("_sb_g") * F.col("_sb_t")).cast("double")
    c_term = (F.col("_sc_g") * F.col("_sc_t")).cast("double")
    ndd = F.col("n").cast("double")
    var = (
        a_term / F.lit(72.0)
        + b_term
        / (F.lit(36.0) * ndd * (ndd - 1) * (ndd - 2))
        + c_term / (F.lit(8.0) * ndd * (ndd - 1))
    )
    jt = F.col("_jt2").cast("double") / F.lit(2.0)
    mean = (nd * nd - F.col("_sn2")).cast("double") / F.lit(4.0)
    z = (jt - mean) / F.sqrt(var)
    ok = (F.col("k") >= 2) & (var > 0)
    return out.select(
        *by, "n", "k", jt.alias("jt"), F.when(ok, z).alias("z")
    )


def trimmed_stats(
    df: DataFrame,
    by: list[str],
    value_col: str,
    trim: str = "0.05",
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, n_used, trimmed_mean, winsorized_mean)`` — the
    α-trimmed and α-winsorized means, the robust location estimates
    between the mean (efficient, fragile) and the median (robust,
    wasteful): drop — or clamp to the cut values — the lowest and
    highest g = ⌊α·n⌋ observations per group.

    ``trim`` is a decimal STRING (the L172/L202 convention) so
    g = ⌊α·n⌋ is exact decimal arithmetic — no float wobble at exact
    multiples.  Values are summed at DECIMAL(18,scale) (exact); with
    rank positions from ONE keyed window sort,

        trimmed    = Σ_{g < rn ≤ n−g} v / (n − 2g)
        winsorized = (Σ_kept + g·v_(g+1) + g·v_(n−g)) / n

    — order statistics are engine-exact and the kept MULTISET is
    determined by rank positions alone (boundary ties drop
    interchangeable copies), so both means are exact-sum-then-ONE-
    division: bit-identical, ungridded.  Groups where trimming
    consumes everything (n ≤ 2g) yield NULLs.

    Scale shape: one keyed window sort (the semantics) + one
    combinable conditional agg.  100 TB scans once."""
    import decimal

    try:
        t_val = decimal.Decimal(trim)
    except decimal.InvalidOperation as exc:
        raise ValueError(f"trimmed_stats: unparseable trim {trim!r}") from exc
    if not 0 <= t_val < decimal.Decimal("0.5"):
        raise ValueError(
            f"trimmed_stats: trim must be in [0, 0.5), got {trim!r}"
        )
    dec = f"decimal(18,{scale})"
    a = F.lit(trim).cast("decimal(9,6)")
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).cast(dec).alias("_v")
    )
    w = Window.partitionBy(*by).orderBy("_v")
    tot = Window.partitionBy(*by)
    staged = flt.select(
        *by,
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(tot).alias("_n"),
    ).withColumn(
        "_g",
        F.floor(a * F.col("_n").cast("decimal(20,0)")).cast("long"),
    )
    kept = (F.col("_rn") > F.col("_g")) & (
        F.col("_rn") <= F.col("_n") - F.col("_g")
    )
    agg = staged.groupBy(*by).agg(
        F.max("_n").alias("n"),
        F.max("_g").alias("_gg"),
        F.sum(F.when(kept, F.col("_v"))).alias("_skept"),
        F.sum(kept.cast("long")).alias("n_used"),
        F.max(
            F.when(F.col("_rn") == F.col("_g") + 1, F.col("_v"))
        ).alias("_vlo"),
        F.max(
            F.when(F.col("_rn") == F.col("_n") - F.col("_g"), F.col("_v"))
        ).alias("_vhi"),
    )
    gd = F.col("_gg").cast(dec)
    wsum = F.col("_skept") + gd * F.col("_vlo") + gd * F.col("_vhi")
    ok = F.col("n_used") > 0
    return agg.select(
        *by,
        "n",
        "n_used",
        F.when(
            ok,
            F.col("_skept").cast("double") / F.col("n_used").cast("double"),
        ).alias("trimmed_mean"),
        F.when(
            ok, wsum.cast("double") / F.col("n").cast("double")
        ).alias("winsorized_mean"),
    )


def dunn_posthoc(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """``(g_a, g_b, n_a, n_b, mean_rank_a, mean_rank_b, z)`` — Dunn's
    (1964) post-hoc pairwise rank test (L233): AFTER Kruskal-Wallis
    (L174) rejects "all k groups equal", WHICH pairs differ — the
    tie-corrected pairwise z over the pooled ranking (compare |z|
    against the caller's Bonferroni/BH-adjusted critical value — the
    L211 FDR machinery composes directly).

        z_ab = (R̄_a − R̄_b) / sqrt(σ² (1/n_a + 1/n_b))
        σ²   = N(N+1)/12 − Σ(t³−t) / (12(N−1))

    Doubled average ranks keep every rank sum an exact integer (the
    L146/L174 trick); R̄ = (R2/n)/2 is two exactly-rounded divisions;
    σ² and z are fixed IEEE trees — bit-identical, ungridded.  Pairs
    are emitted once with g_a < g_b (deterministic orientation).
    σ² ≤ 0 (all values tied) → NULL z.

    Scale shape: the L174 rank sweep (one distinct-value window) + a
    bounded k×k self-join on the per-group table.  Continuous values
    bucketed first (the L159 discipline).

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    pts = flt.groupBy(
        F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy("_v").agg(F.sum("_c").alias("_cv"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    vals = vals.withColumn(
        "_before", F.coalesce(F.sum("_cv").over(w), F.lit(0))
    )
    two_rank = (
        F.lit(2) * F.col("_before") + F.col("_cv") + F.lit(1)
    ).cast(_DEC)
    per_group = (
        pts.join(vals, "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c").cast(_DEC) * two_rank).alias("_r2"),
        )
    )
    tstats = vals.agg(
        F.sum("_cv").alias("_nt"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("_v"), F.col("_cv")))),
            F.lit(0.0),
            lambda a, s: a
            + (
                s["_cv"].cast(_DEC) * s["_cv"].cast(_DEC) * s["_cv"].cast(_DEC)
                - s["_cv"].cast(_DEC)
            ).cast("double"),
        ).alias("_tt"),
    )
    a = per_group.select(
        F.col("_g").alias("g_a"),
        F.col("_n").alias("n_a"),
        F.col("_r2").alias("_r2a"),
    )
    b = per_group.select(
        F.col("_g").alias("g_b"),
        F.col("_n").alias("n_b"),
        F.col("_r2").alias("_r2b"),
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b")).crossJoin(
        F.broadcast(tstats)
    )
    nd = F.col("_nt").cast("double")
    sigma2 = (nd * (nd + F.lit(1.0))) / F.lit(12.0) - F.col("_tt") / (
        F.lit(12.0) * (nd - F.lit(1.0))
    )
    mra = (F.col("_r2a").cast("double") / F.col("n_a").cast("double")) / F.lit(
        2.0
    )
    mrb = (F.col("_r2b").cast("double") / F.col("n_b").cast("double")) / F.lit(
        2.0
    )
    se = F.sqrt(
        sigma2
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    ok = sigma2 > 0.0
    return pairs.select(
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        mra.alias("mean_rank_a"),
        mrb.alias("mean_rank_b"),
        F.when(ok, (mra - mrb) / se).alias("z"),
    )


def ks_uniform(
    df: DataFrame,
    by: list[str],
    value_col: str,
    lo: str,
    hi: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, d_plus, d_minus, d, stat)`` — the ONE-sample
    Kolmogorov-Smirnov test against a Uniform(lo, hi) reference
    (L243): the distribution-FIT gate completing the two-sample family
    (L147 compares two empirical samples; this asks "does the data
    match the spec" — hash uniformity, id-allocation audits, datagen
    validation).  ``lo``/``hi`` are decimal strings so the reference
    CDF numerator x − lo stays EXACT.

        F(x) = (x − lo)/(hi − lo)
        D⁺ = max_v (c_v/n − F(v)),  D⁻ = max_v (F(v) − (c_v − l_v)/n)
        D  = max(D⁺, D⁻),  stat = √n·D

    over the DISTINCT sorted values (c = cumulative count, l = count
    at v — the tie-correct jump form).  Every candidate is a fixed
    IEEE tree over exact integers/decimals; ``max`` is
    order-insensitive — bit-identical, ungridded, one keyed window
    over the bounded distinct-value grid.  Values outside [lo, hi]
    are refused loudly (the reference CDF is undefined there).

    No reference counterpart; distribution-audit analytics per SURVEY
    §2.11 (composes with L147 KS, L181 Wasserstein, L244 AD).
    """
    dec = f"decimal(18,{scale})"
    lo_l = F.lit(lo).cast(dec)
    hi_l = F.lit(hi).cast(dec)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).cast(dec).alias("_x")
    )
    if validation_enabled():
        n_out = base.filter(
            (F.col("_x") < lo_l) | (F.col("_x") > hi_l)
        ).count()
        if n_out:
            raise ValueError(
                f"ks_uniform: {n_out} value(s) outside [{lo}, {hi}] — the "
                "uniform reference CDF is undefined there"
            )
    pv = base.groupBy(*by, "_x").agg(F.count(F.lit(1)).alias("_l"))
    wk = Window.partitionBy(*by).orderBy("_x")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = pv.select(
        *by,
        "_x",
        "_l",
        F.sum("_l").over(wkp).alias("_c"),
        F.sum("_l").over(wka).alias("_n"),
    )
    nd = F.col("_n").cast("double")
    fx = (F.col("_x") - lo_l).cast("double") / (hi_l - lo_l).cast("double")
    d_plus = F.col("_c").cast("double") / nd - fx
    d_minus = fx - (F.col("_c") - F.col("_l")).cast("double") / nd
    agg = pre.groupBy(*by, "_n").agg(
        F.max(d_plus).alias("d_plus"), F.max(d_minus).alias("d_minus")
    )
    d = F.greatest(F.col("d_plus"), F.col("d_minus"))
    return agg.select(
        *by,
        F.col("_n").alias("n"),
        "d_plus",
        "d_minus",
        d.alias("d"),
        (F.sqrt(F.col("_n").cast("double")) * d).alias("stat"),
    )


def anderson_darling_2samp(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, n, a2)`` — the two-sample Anderson-Darling
    statistic with the Scholz-Stephens (1987) tie correction (L244):
    the TAIL-sensitive companion to KS (L147 weights every quantile
    equally; AD up-weights the distribution's tails, where drifted
    data usually diverges first).

    Over the pooled DISTINCT sorted values with l_j = pooled count,
    doubled mid-cumulatives Bh_j = 2·B_{<j} + l_j and (per sample)
    Mh_ij = 2·m_{i,<j} + l_ij — ALL exact BIGINTs — each cell's term

        (l_j · num²) / (N · D_j),
        num = N·Mh_ij − n_i·Bh_j,   D_j = Bh_j(2N − Bh_j) − N·l_j

    is a fixed IEEE tree (the half/quarter factors of the published
    formula cancel against the doubling — derivation in the module
    history), folded over the bounded sorted value list per sample,
    then A² = ((N−1)/N)·(S_a/n_a + S_b/n_b).  Cells with D_j ≤ 0 (the
    single-distinct-value degenerate) contribute 0; a group with an
    empty side or no distinct values → NULL a2.  Compare against the
    published critical values (p-values deliberately not emitted, the
    L139 discipline).

    Scale shape: one (keys, value, group) groupBy + two keyed windows
    over the bounded distinct-value grid + one combinable fold — the
    L147/L181 shape exactly.

    No reference counterpart; drift analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    pts = flt.groupBy(
        *by, F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    la = F.sum(F.when(F.col("_g") == sample_a, F.col("_c")).otherwise(0))
    lb = F.sum(F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0))
    vals = pts.groupBy(*by, "_v").agg(
        la.alias("_la"), lb.alias("_lb")
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wprev = wk.rowsBetween(Window.unboundedPreceding, -1)
    wall = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = vals.select(
        *by,
        "_v",
        (F.col("_la") + F.col("_lb")).alias("_l"),
        "_la",
        "_lb",
        F.coalesce(F.sum(F.col("_la") + F.col("_lb")).over(wprev), F.lit(0)).alias("_bprev"),
        F.coalesce(F.sum("_la").over(wprev), F.lit(0)).alias("_maprev"),
        F.coalesce(F.sum("_lb").over(wprev), F.lit(0)).alias("_mbprev"),
        F.sum("_la").over(wall).alias("_na"),
        F.sum("_lb").over(wall).alias("_nb"),
    )
    n = F.col("_na") + F.col("_nb")
    bh = F.lit(2) * F.col("_bprev") + F.col("_l")
    mha = F.lit(2) * F.col("_maprev") + F.col("_la")
    mhb = F.lit(2) * F.col("_mbprev") + F.col("_lb")
    nd = n.cast("double")
    dj = (
        bh.cast("double") * (F.lit(2.0) * nd - bh.cast("double"))
        - nd * F.col("_l").cast("double")
    )

    def _term(mh, ni):
        num = nd * mh.cast("double") - ni.cast("double") * bh.cast("double")
        return F.when(
            dj > 0.0,
            (F.col("_l").cast("double") * (num * num)) / (nd * dj),
        ).otherwise(F.lit(0.0))

    staged = pre.select(
        *by,
        "_v",
        "_na",
        "_nb",
        _term(mha, F.col("_na")).alias("_ta"),
        _term(mhb, F.col("_nb")).alias("_tb"),
    )
    # ONE sorted list, ONE fold carrying both per-sample sums in a
    # struct accumulator (same element order for both — the a-sum tree
    # is identical to a standalone fold's)
    agg = staged.groupBy(*by, "_na", "_nb").agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("_v", "_ta", "_tb"))
            ),
            F.struct(
                F.lit(0.0).alias("a"), F.lit(0.0).alias("b")
            ),
            lambda acc, v: F.struct(
                (acc["a"] + v["_ta"]).alias("a"),
                (acc["b"] + v["_tb"]).alias("b"),
            ),
        ).alias("_s2")
    ).select(
        *by,
        "_na",
        "_nb",
        F.col("_s2.a").alias("_sa"),
        F.col("_s2.b").alias("_sb"),
    )
    nad = F.col("_na").cast("double")
    nbd = F.col("_nb").cast("double")
    ntd = (F.col("_na") + F.col("_nb")).cast("double")
    a2 = ((ntd - F.lit(1.0)) / ntd) * (
        F.col("_sa") / nad + F.col("_sb") / nbd
    )
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0)
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        (F.col("_na") + F.col("_nb")).alias("n"),
        F.when(ok, a2).alias("a2"),
    )


def page_trend(
    df: DataFrame,
    by: list[str],
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., k, n_blocks, l_stat, z)`` — Page's L test (1963) for
    ORDERED alternatives in a complete-block design (L245): the
    within-subject counterpart to Jonckheere-Terpstra (L198) — after
    Friedman (L190) asks "any treatment difference", Page asks "do the
    treatments trend in THIS order", with the order taken from the
    treatment column's natural sort.

        L = Σ_j c_j·R_j     (c_j = 1..k in treatment order,
                             R_j = rank sum of treatment j)
        z = (L − m·k(k+1)²/4) / sqrt(m·k²(k+1)(k²−1)/144)

    The L190 machinery supplies exact doubled within-block ranks
    (average ranks under ties; duplicate cells collapse with max,
    incomplete blocks drop — the same documented conventions), so
    2L and 2E = m·k(k+1)²/2 are exact integers and z is ONE fixed
    IEEE tree.  The variance is the standard no-tie form (the common
    practical convention under moderate ties — documented).  k < 3 or
    zero variance → NULL z.

    Scale shape: identical to L190 plus one bounded treatment-rank
    window.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    cell = (
        df.filter(
            F.col(block_col).isNotNull()
            & F.col(treat_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            *by,
            F.col(block_col).alias("_b"),
            F.col(treat_col).alias("_t"),
        )
        .agg(F.max(value_col).alias("_v"))
    )
    kdf = cell.groupBy(*by).agg(F.countDistinct("_t").alias("k"))
    bs = cell.groupBy(*by, "_b").agg(F.count(F.lit(1)).alias("_bc"))
    joined = cell.join(bs, [*by, "_b"])
    full = (
        joined.join(F.broadcast(kdf), list(by))
        if by
        else joined.crossJoin(F.broadcast(kdf))
    )
    full = full.filter((F.col("_bc") == F.col("k")) & (F.col("k") >= 2))
    wb = [*by, "_b"]
    w_cum = (
        Window.partitionBy(*wb)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_eq = Window.partitionBy(*wb, "_v")
    ranked = full.withColumn(
        "_2r",
        (
            F.lit(2) * F.count(F.lit(1)).over(w_cum)
            - F.count(F.lit(1)).over(w_eq)
            + F.lit(1)
        ).cast(_DEC),
    )
    tr = ranked.groupBy(*by, "k", "_t").agg(
        F.sum("_2r").alias("_2rj"), F.count(F.lit(1)).alias("_nb")
    )
    w_score = Window.partitionBy(*by).orderBy("_t")
    tr = tr.withColumn("_c", F.dense_rank().over(w_score).cast(_DEC))
    agg = tr.groupBy(*by, "k").agg(
        F.max("_nb").alias("n_blocks"),
        F.sum(F.col("_c") * F.col("_2rj")).alias("_2l"),
    )
    kd = F.col("k").cast(_DEC)
    md = F.col("n_blocks").cast(_DEC)
    two_e = md * kd * (kd + 1) * (kd + 1) / 2
    kdd = F.col("k").cast("double")
    mdd = F.col("n_blocks").cast("double")
    v = (
        mdd
        * kdd
        * kdd
        * (kdd + F.lit(1.0))
        * (kdd * kdd - F.lit(1.0))
    ) / F.lit(144.0)
    z = (F.col("_2l") - two_e).cast("double") / (
        F.lit(2.0) * F.sqrt(v)
    )
    ok = (F.col("k") >= 3) & (v > 0.0)
    return agg.select(
        *by,
        "k",
        "n_blocks",
        (F.col("_2l").cast("double") / F.lit(2.0)).alias("l_stat"),
        F.when(ok, z).alias("z"),
    )


def kendalls_w(
    df: DataFrame,
    by: list[str],
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., k, n_blocks, q, w)`` — Kendall's coefficient of
    concordance (L247): how strongly m raters/blocks agree on a
    RANKING of k items, on the [0, 1] scale the agreement family
    reports (κ L184, Fleiss L192, α L238 measure categorical
    agreement; W measures ORDINAL agreement).  Computed through the
    tie-corrected Friedman statistic (L190 — the identity
    W = Q/(m(k−1)), Legendre 2005), so every rank intermediate is the
    L190 exact doubled integer and W adds ONE division — the two
    statistics can never disagree.  NULL q (degenerate) → NULL w.

    Scale shape: exactly L190's.

    No reference counterpart; annotation-QA analytics per SURVEY
    §2.11.
    """
    f = friedman(df, by, block_col, treat_col, value_col)
    w = F.col("q") / (
        F.col("n_blocks").cast("double")
        * (F.col("k").cast("double") - F.lit(1.0))
    )
    return f.select(*by, "k", "n_blocks", "q", w.alias("w"))


def cramer_von_mises_2samp(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, n, t)`` — the two-sample Cramér-von Mises
    statistic (L264): the INTEGRAL-squared member completing the
    two-sample family (KS L147 = max gap, AD L244 = tail-weighted,
    W₁ L181 = integral of |gap|; CvM = integral of gap², the balanced
    middle ground):

        T = (n_a·n_b / N²) · Σ_j l_j · (A_j/n_a − B_j/m)²
          = Σ_j l_j·(A_j·n_b − B_j·n_a)² / (N²·n_a·n_b)

    with A/B the inclusive per-sample cumulative counts at each pooled
    distinct value and l_j the pooled count — the cross-multiplied
    form keeps every numerator an EXACT integer (the L181 trick);
    each cell term is one fixed tree folded over the bounded sorted
    value list.  An empty side → NULL t.

    Scale shape: the L147/L181/L244 shape exactly — one grid groupBy,
    two prefix windows, one bounded fold.

    No reference counterpart; drift analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    pts = flt.groupBy(
        *by, F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy(*by, "_v").agg(
        F.sum(
            F.when(F.col("_g") == sample_a, F.col("_c")).otherwise(0)
        ).alias("_la"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_lb"),
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = vals.select(
        *by,
        "_v",
        (F.col("_la") + F.col("_lb")).alias("_l"),
        F.sum("_la").over(wkp).alias("_ca"),
        F.sum("_lb").over(wkp).alias("_cb"),
        F.sum("_la").over(wka).alias("_na"),
        F.sum("_lb").over(wka).alias("_nb"),
    )
    num = (
        F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na")
    ).cast("decimal(38,0)")
    term = (
        F.col("_l").cast("double")
        * (num.cast("double") * num.cast("double"))
    )
    staged = pre.select(
        *by, "_v", "_na", "_nb", term.alias("_t")
    )
    agg = staged.groupBy(*by, "_na", "_nb").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_v", "_t"))),
            F.lit(0.0),
            lambda acc, v: acc + v["_t"],
        ).alias("_s")
    )
    nad = F.col("_na").cast("double")
    nbd = F.col("_nb").cast("double")
    ntd = (F.col("_na") + F.col("_nb")).cast("double")
    t = F.col("_s") / (ntd * ntd * nad * nbd)
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0)
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        (F.col("_na") + F.col("_nb")).alias("n"),
        F.when(ok, t).alias("t"),
    )


def brunner_munzel(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, p_hat, w, df_bm)`` — the Brunner-Munzel
    test (L268): the tie- and variance-robust replacement for
    Mann-Whitney (Brunner & Munzel 2000) — does NOT assume equal
    variances or distribution shapes, which is the realistic regime
    for A/B metric comparison:

        p̂ = (R̄_b − (n_b+1)/2) / n_a        (P(A<B) + ½P(A=B))
        W  = n_a·n_b·(R̄_b − R̄_a) / ((n_a+n_b)·sqrt(n_a·S_a² + n_b·S_b²))

    with S_i² the rank-difference variances.  Every accumulated
    quantity is an EXACT integer: pooled and within-sample DOUBLED
    midranks (2·midrank = 2·cum − l + 1, the L142 trick) make each
    centred term D = n·dr − n·drw − Σdr + n·(n+1) an exact
    DECIMAL(38,0), so Σ l·D² is order-insensitive — plain combinable
    sums, NO folds — and S² = ΣD²/(4n²(n−1)) is one fixed IEEE tree.
    Welch-like df_bm emitted for the caller's t lookup.  Degenerate
    groups (n < 2 either side, or zero variance) → NULL w/df_bm.
    DECIMAL(38,0) bounds Σl·D² ≲ 16·N⁵: safe to ~10⁶ rows per group,
    ANSI fails loudly beyond.

    Scale shape: one (keys, value) groupBy + two window passes over
    the bounded value grid + one combinable agg — one scan of 100 TB.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    pts = flt.groupBy(
        *by, F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy(*by, "_v").agg(
        F.sum(
            F.when(F.col("_g") == sample_a, F.col("_c")).otherwise(0)
        ).alias("_la"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_lb"),
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s1 = vals.select(
        *by,
        "_v",
        "_la",
        "_lb",
        (F.col("_la") + F.col("_lb")).alias("_l"),
        F.sum(F.col("_la") + F.col("_lb")).over(wkp).alias("_cp"),
        F.sum("_la").over(wkp).alias("_ca"),
        F.sum("_lb").over(wkp).alias("_cb"),
        F.sum("_la").over(wka).alias("_na"),
        F.sum("_lb").over(wka).alias("_nb"),
    )
    dr = F.lit(2) * F.col("_cp") - F.col("_l") + 1
    dra = F.lit(2) * F.col("_ca") - F.col("_la") + 1
    drb = F.lit(2) * F.col("_cb") - F.col("_lb") + 1
    s2 = s1.select(
        *by,
        "_la",
        "_lb",
        "_na",
        "_nb",
        dr.cast(d0).alias("_dr"),
        dra.cast(d0).alias("_dra"),
        drb.cast(d0).alias("_drb"),
        F.sum(F.col("_la") * dr).over(wka).cast(d0).alias("_sa"),
        F.sum(F.col("_lb") * dr).over(wka).cast(d0).alias("_sb"),
    )
    nad = F.col("_na").cast(d0)
    nbd = F.col("_nb").cast(d0)
    da = (
        nad * F.col("_dr")
        - nad * F.col("_dra")
        - F.col("_sa")
        + nad * (nad + 1)
    )
    db = (
        nbd * F.col("_dr")
        - nbd * F.col("_drb")
        - F.col("_sb")
        + nbd * (nbd + 1)
    )
    agg = s2.groupBy(*by, "_na", "_nb", "_sa", "_sb").agg(
        F.sum(F.col("_la").cast(d0) * da * da).alias("_qa"),
        F.sum(F.col("_lb").cast(d0) * db * db).alias("_qb"),
    )
    na = F.col("_na").cast("double")
    nb_ = F.col("_nb").cast("double")
    ra = F.col("_sa").cast("double") / (F.lit(2.0) * na)
    rb = F.col("_sb").cast("double") / (F.lit(2.0) * nb_)
    sa2 = F.col("_qa").cast("double") / (
        F.lit(4.0) * na * na * (na - F.lit(1.0))
    )
    sb2 = F.col("_qb").cast("double") / (
        F.lit(4.0) * nb_ * nb_ * (nb_ - F.lit(1.0))
    )
    pooled = na * sa2 + nb_ * sb2
    w = na * nb_ * (rb - ra) / ((na + nb_) * F.sqrt(pooled))
    dfb = (pooled * pooled) / (
        (na * sa2) * (na * sa2) / (na - F.lit(1.0))
        + (nb_ * sb2) * (nb_ * sb2) / (nb_ - F.lit(1.0))
    )
    ok = (F.col("_na") >= 2) & (F.col("_nb") >= 2) & (pooled > 0.0)
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0),
            (rb - (nb_ + F.lit(1.0)) / F.lit(2.0)) / na,
        ).alias("p_hat"),
        F.when(ok, w).alias("w"),
        F.when(ok, dfb).alias("df_bm"),
    )


def ansari_bradley(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, ab, e_ab, var_ab, z)`` — the
    Ansari-Bradley scale test (L269): do two samples differ in
    DISPERSION around a common median — the rank-based companion to
    the parametric variance tests (Bartlett L232 / Brown-Forsythe):
    scores a(r) = min(r, N+1−r) grow toward the pooled centre, so a
    tighter sample collects a HIGHER score sum AB = Σ_{i∈A} a(Rᵢ).

    Tie handling is exact: a tie block occupying pooled positions
    p+1..p+l gets the block score-sum in closed form (two arithmetic
    series split at h = ⌊(N+1)/2⌋), kept DOUBLED so it stays an exact
    DECIMAL(38,0) integer; each element's averaged score is then a
    fixed tree folded over the BOUNDED sorted value grid (the L257
    discipline).  Null moments are the sampling-without-replacement
    moments over the realized (tie-averaged) score multiset:

        E[AB]   = n_a·Σs / N
        Var[AB] = n_a·(N−n_a)/(N·(N−1)) · (Σs² − N·s̄²)
        z       = (AB − E) / sqrt(Var)

    Var ≤ 0 (all scores equal) → NULL z.

    Scale shape: one (keys, value) groupBy + one window pass over the
    bounded grid + one bounded fold — one scan of 100 TB.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    pts = flt.groupBy(
        *by, F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy(*by, "_v").agg(
        F.sum(
            F.when(F.col("_g") == sample_a, F.col("_c")).otherwise(0)
        ).alias("_la"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_lb"),
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s1 = vals.select(
        *by,
        "_v",
        "_la",
        (F.col("_la") + F.col("_lb")).alias("_l"),
        F.sum(F.col("_la") + F.col("_lb")).over(wkp).alias("_cp"),
        F.sum("_la").over(wka).alias("_na"),
        F.sum("_lb").over(wka).alias("_nb"),
    )
    p = (F.col("_cp") - F.col("_l")).cast(d0)
    l_ = F.col("_l").cast(d0)
    n_ = (F.col("_na") + F.col("_nb")).cast(d0)
    h = F.floor((F.col("_na") + F.col("_nb") + 1) / 2).cast(d0)
    lo_hi = F.least(p + l_, h)
    c1 = F.when(
        p + 1 <= lo_hi, lo_hi * (lo_hi + 1) - p * (p + 1)
    ).otherwise(F.lit(0).cast(d0))
    hi_lo = F.greatest(p + 1, h + 1)
    cnt2 = p + l_ - hi_lo + 1
    c2 = F.when(
        cnt2 > 0,
        F.lit(2).cast(d0) * cnt2 * (n_ + 1)
        - ((p + l_) * (p + l_ + 1) - (hi_lo - 1) * hi_lo),
    ).otherwise(F.lit(0).cast(d0))
    s2 = s1.select(
        *by,
        "_v",
        "_la",
        "_l",
        "_na",
        "_nb",
        (c1 + c2).alias("_tb"),
    )
    agg = s2.groupBy(*by, "_na", "_nb").agg(
        F.sum("_tb").alias("_tbsum"),
        F.sort_array(
            F.collect_list(F.struct("_v", "_la", "_l", "_tb"))
        ).alias("_lv"),
    )
    nad = F.col("_na").cast("double")
    nbd = F.col("_nb").cast("double")
    nd = nad + nbd
    ab = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, e: acc
        + e["_la"].cast("double")
        * (
            e["_tb"].cast("double")
            / (F.lit(2.0) * e["_l"].cast("double"))
        ),
    )
    ss = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, e: acc
        + e["_tb"].cast("double")
        * e["_tb"].cast("double")
        / (F.lit(4.0) * e["_l"].cast("double")),
    )
    sbar = F.col("_tbsum").cast("double") / (F.lit(2.0) * nd)
    e_ab = nad * F.col("_tbsum").cast("double") / (F.lit(2.0) * nd)
    var = (
        nad
        * (nd - nad)
        / (nd * (nd - F.lit(1.0)))
        * (ss - nd * sbar * sbar)
    )
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0) & (nd > 1)
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.when((F.col("_na") > 0) & (F.col("_nb") > 0), ab).alias("ab"),
        F.when(ok, e_ab).alias("e_ab"),
        F.when(ok, var).alias("var_ab"),
        F.when(ok & (var > 0.0), (ab - e_ab) / F.sqrt(var)).alias("z"),
    )


def quade_test(
    df: DataFrame,
    by: list[str],
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_blocks, k, f_stat, df1, df2)`` — the Quade test
    (L271): the complete-block ranked ANOVA that WEIGHTS blocks by
    their range, so blocks that discriminate more count more — the
    power-preserving alternative to Friedman (whose identity already
    drives Kendall's W, L247) for small treatment counts:

        S_ij = Q_b·(r_ij − (k+1)/2)
        F = (b−1)·B / (A − B),  A = ΣS²,  B = (1/b)·Σ_j (Σ_b S_ij)²

    with r = within-block midranks of the values and Q = midranks of
    the block ranges.  Both rank layers use DOUBLED midranks
    (2·rank_min + ties − 1, the L142 trick), so 4·S = dq·(dr − (k+1))
    is an EXACT DECIMAL(38,0) integer and A/B come from plain
    combinable integer sums — no folds; F is one fixed IEEE tree.
    Incomplete blocks or duplicate (block, treatment) cells are
    REFUSED loudly (Quade is defined on complete blocks); a perfectly
    consistent ranking (A = B) → NULL f_stat (F = ∞).
    df1 = k−1, df2 = (b−1)(k−1).

    Scale shape: two window passes (within-block over ≤k rows, range
    ranks over the bounded block list) + one combinable agg — one
    scan, no driver loops beyond the completeness count.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treat_col).isNotNull()
    )
    if validation_enabled():
        dup = (
            flt.groupBy(*by, block_col, treat_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"quade_test: {dup} duplicate (block, treatment) cell(s)"
            )
    k_per_group = flt.groupBy(*by).agg(
        F.countDistinct(treat_col).alias("_k")
    )
    blk_counts = flt.groupBy(*by, block_col).agg(
        F.count(F.lit(1)).alias("_bk")
    )
    joined_counts = (
        blk_counts.join(k_per_group, by)
        if by
        else blk_counts.crossJoin(k_per_group)
    )
    if validation_enabled():
        incomplete = joined_counts.filter(
            F.col("_bk") != F.col("_k")
        ).count()
        if incomplete:
            raise ValueError(
                f"quade_test: {incomplete} incomplete block(s)"
            )
    wb = Window.partitionBy(*by, block_col).orderBy(value_col)
    we = Window.partitionBy(*by, block_col, value_col)
    ranked = flt.select(
        *by,
        F.col(block_col).alias("_blk"),
        F.col(treat_col).alias("_trt"),
        (
            F.lit(2) * F.rank().over(wb)
            + F.count(F.lit(1)).over(we)
            - 1
        ).alias("_dr"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*by, block_col))
        .alias("_k"),
    )
    ranges = flt.groupBy(*by, F.col(block_col).alias("_blk")).agg(
        (F.max(value_col) - F.min(value_col)).alias("_rng")
    )
    wr = Window.partitionBy(*by).orderBy("_rng")
    wre = Window.partitionBy(*by, "_rng")
    qranks = ranges.select(
        *by,
        "_blk",
        (
            F.lit(2) * F.rank().over(wr)
            + F.count(F.lit(1)).over(wre)
            - 1
        ).alias("_dq"),
    )
    cells = ranked.join(qranks, [*by, "_blk"]).select(
        *by,
        "_trt",
        "_k",
        (
            F.col("_dq").cast(d0)
            * (F.col("_dr").cast(d0) - (F.col("_k").cast(d0) + 1))
        ).alias("_s4"),
    )
    per_treat = cells.groupBy(*by, "_k", "_trt").agg(
        F.count(F.lit(1)).alias("_b"),
        F.sum(F.col("_s4") * F.col("_s4")).alias("_a4"),
        F.sum("_s4").alias("_t4"),
    )
    agg = per_treat.groupBy(*by, "_k").agg(
        F.max("_b").alias("n_blocks"),
        F.sum("_a4").alias("_a"),
        F.sum(F.col("_t4") * F.col("_t4")).alias("_bsum"),
    )
    bd = F.col("n_blocks").cast("double")
    kd = F.col("_k").cast("double")
    a_ = F.col("_a").cast("double") / F.lit(16.0)
    b_ = F.col("_bsum").cast("double") / (F.lit(16.0) * bd)
    fstat = (bd - F.lit(1.0)) * b_ / (a_ - b_)
    ok = (
        (F.col("n_blocks") >= 2)
        & (F.col("_k") >= 2)
        & (a_ > b_)
    )
    return agg.select(
        *by,
        "n_blocks",
        F.col("_k").alias("k"),
        F.when(ok, fstat).alias("f_stat"),
        F.when(ok, F.col("_k") - 1).alias("df1"),
        F.when(
            ok, (F.col("n_blocks") - 1) * (F.col("_k") - 1)
        ).alias("df2"),
    )


def bartels_rank_test(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``(by..., n, rvn, z)`` — the Bartels rank von Neumann ratio
    test (L278): is a series RANDOM against serial correlation — the
    rank-based (outlier-proof) counterpart to Durbin-Watson (L220-era
    ``durbin_watson``) and the runs test (L219), more powerful than
    runs against smooth drift:

        RVN = Σᵢ (rᵢ − rᵢ₊₁)² / Σᵢ (rᵢ − r̄)²,   E[RVN] = 2
        z = (RVN − 2) / sqrt(4·(n−2)·(5n²−2n−9) / (5n(n+1)(n−1)²))

    Midranks make both sums EXACT integers when DOUBLED (the L142
    trick): r̄ is always exactly (n+1)/2 because midranks sum to
    n(n+1)/2 regardless of ties, so 4·NM = Σ(drᵢ − drᵢ₊₁)² and
    4·D = Σ(drᵢ − (n+1))² are plain combinable integer sums — no
    folds — and RVN is ONE division.  All-tied series (D = 0) or
    n < 3 → NULL rvn/z.  NULL values refused (they shift the series).

    Scale shape: two window passes (value midranks + one lead over
    the time order) + one combinable agg — one keyed exchange.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"bartels_rank_test: {n_null} NULL value(s) — impute first"
            )
    d0 = "decimal(38,0)"
    wv = Window.partitionBy(*by).orderBy(value_col)
    we = Window.partitionBy(*by, value_col)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        *by,
        *[c for c in order_cols if c not in by],
        (
            F.lit(2) * F.rank().over(wv)
            + F.count(F.lit(1)).over(we)
            - 1
        ).alias("_dr"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    led = ranked.select(
        *by,
        "_n",
        "_dr",
        F.lead("_dr", 1).over(wt).alias("_dn"),
    )
    diff = (F.col("_dr") - F.col("_dn")).cast(d0)
    dev = (F.col("_dr") - (F.col("_n") + 1)).cast(d0)
    agg = led.groupBy(*by, "_n").agg(
        F.sum(F.when(F.col("_dn").isNotNull(), diff * diff)).alias(
            "_nm4"
        ),
        F.sum(dev * dev).alias("_d4"),
    )
    nd = F.col("_n").cast("double")
    rvn = F.col("_nm4").cast("double") / F.col("_d4").cast("double")
    var = (
        F.lit(4.0)
        * (nd - F.lit(2.0))
        * (F.lit(5.0) * nd * nd - F.lit(2.0) * nd - F.lit(9.0))
        / (
            F.lit(5.0)
            * nd
            * (nd + F.lit(1.0))
            * (nd - F.lit(1.0))
            * (nd - F.lit(1.0))
        )
    )
    ok = (F.col("_n") >= 3) & (
        F.col("_d4") > F.lit(0).cast(d0)
    )
    return agg.select(
        *by,
        F.col("_n").alias("n"),
        F.when(ok, rvn).alias("rvn"),
        F.when(ok, (rvn - F.lit(2.0)) / F.sqrt(var)).alias("z"),
    )


def energy_distance(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
    max_len: int = 1000,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n_a, n_b, e_dist, t_stat)`` — the (Székely-Rizzo)
    energy distance two-sample test (L300): sensitive to ANY
    distributional difference — location, scale, OR shape — where the
    two-sample family's members each watch one aspect (KS L147 = max
    gap, CvM L264 = integral gap, AD L244 = tails, BM L268 =
    location, AB L269 = scale):

        E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|   (≥ 0, = 0 iff same dist)
        T = (n_a·n_b/(n_a+n_b))·E           (the permutation statistic)

    Each expectation is a pair-lattice mean over the BOUNDED sorted
    per-group samples (the L161 max_len contract): values are exact
    DECIMAL(18,scale), every |difference| is exact, and the in-array
    fold order is pinned by the sorted arrays.  Within-sample means
    use the n² denominator (diagonal zeros included — the V-statistic
    form).  An empty side → NULL.

    Scale shape: one keyed collect (bounded) → nested in-array folds
    — one scan, one shuffle on the group keys.

    No reference counterpart; drift analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > 2 * max_len).count()
        if over:
            raise ValueError(
                f"energy_distance: a group exceeds 2*max_len={2*max_len}"
                " — the statistic is pairwise; sample first"
            )
    xd = F.col(value_col).cast(dec)
    packed = flt.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(
                F.when(F.col(group_col) == sample_a, xd)
            )
        ).alias("_xa"),
        F.sort_array(
            F.collect_list(
                F.when(F.col(group_col) == sample_b, xd)
            )
        ).alias("_xb"),
    )
    na = F.size("_xa")
    nb = F.size("_xb")

    def _cross(arr1, arr2):
        return F.aggregate(
            F.col(arr1),
            F.lit(0.0),
            lambda a, x: a
            + F.aggregate(
                F.col(arr2),
                F.lit(0.0),
                lambda a2, y: a2 + F.abs(x - y).cast("double"),
            ),
        )

    sxy = _cross("_xa", "_xb")
    sxx = _cross("_xa", "_xa")
    syy = _cross("_xb", "_xb")
    nad = na.cast("double")
    nbd = nb.cast("double")
    e = (
        F.lit(2.0) * sxy / (nad * nbd)
        - sxx / (nad * nad)
        - syy / (nbd * nbd)
    )
    t = nad * nbd / (nad + nbd) * e
    ok = (na > 0) & (nb > 0)
    return packed.select(
        *by,
        na.alias("n_a"),
        nb.alias("n_b"),
        F.when(ok, e).alias("e_dist"),
        F.when(ok, t).alias("t_stat"),
    )


def cucconi_test(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, u, v, c)`` — the Cucconi test (L302,
    Cucconi 1968): the JOINT location-scale two-sample test — one
    statistic where the family needs two (BM L268 for location, AB
    L269 for scale), and older than the better-known Lepage it
    usually beats:

        U = (6·ΣR²  − n_a(N+1)(2N+1)) / √(n_a·n_b(N+1)(2N+1)(8N+11)/5)
        V = same with contrary ranks (N+1−R)
        ρ = 2(N²−4)/((2N+1)(8N+11)) − 1
        C = (U² + V² − 2ρUV) / (2(1−ρ²))

    (reject large C; under H₀, C ≈ its exponential-tail null).
    Midranks handle ties exactly: with DOUBLED ranks, 4·ΣR² = Σl·dr²
    is an exact integer (the L268 grid-window discipline — plain
    combinable sums, no folds); ΣR for the contrary side follows from
    Σdr = N(N+1).  Degenerate sides (n < 1 either side, N < 3) →
    NULL.

    Scale shape: one (keys, value) groupBy + one window pass over the
    bounded grid + one combinable agg — the L268 shape exactly.

    No reference counterpart; drift analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin([sample_a, sample_b])
    )
    pts = flt.groupBy(
        *by, F.col(value_col).alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count(F.lit(1)).alias("_c"))
    vals = pts.groupBy(*by, "_v").agg(
        F.sum(
            F.when(F.col("_g") == sample_a, F.col("_c")).otherwise(0)
        ).alias("_la"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_lb"),
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s1 = vals.select(
        *by,
        "_la",
        (F.col("_la") + F.col("_lb")).alias("_l"),
        F.sum(F.col("_la") + F.col("_lb")).over(wkp).alias("_cp"),
        F.sum("_la").over(wka).alias("_na"),
        F.sum("_lb").over(wka).alias("_nb"),
    )
    dr = (F.lit(2) * F.col("_cp") - F.col("_l") + 1).cast(d0)
    nn = (F.col("_na") + F.col("_nb")).cast(d0)
    # contrary doubled rank: 2(N+1) - dr
    cdr = F.lit(2).cast(d0) * (nn + 1) - dr
    agg = s1.groupBy(*by, "_na", "_nb").agg(
        F.sum(F.col("_la").cast(d0) * dr * dr).alias("_sr4"),
        F.sum(F.col("_la").cast(d0) * cdr * cdr).alias("_sc4"),
    )
    na = F.col("_na").cast("double")
    nb_ = F.col("_nb").cast("double")
    n_ = na + nb_
    sr2 = F.col("_sr4").cast("double") / F.lit(4.0)
    sc2 = F.col("_sc4").cast("double") / F.lit(4.0)
    den = F.sqrt(
        na
        * nb_
        * (n_ + F.lit(1.0))
        * (F.lit(2.0) * n_ + F.lit(1.0))
        * (F.lit(8.0) * n_ + F.lit(11.0))
        / F.lit(5.0)
    )
    u = (
        F.lit(6.0) * sr2
        - na * (n_ + F.lit(1.0)) * (F.lit(2.0) * n_ + F.lit(1.0))
    ) / den
    v = (
        F.lit(6.0) * sc2
        - na * (n_ + F.lit(1.0)) * (F.lit(2.0) * n_ + F.lit(1.0))
    ) / den
    rho = F.lit(2.0) * (n_ * n_ - F.lit(4.0)) / (
        (F.lit(2.0) * n_ + F.lit(1.0))
        * (F.lit(8.0) * n_ + F.lit(11.0))
    ) - F.lit(1.0)
    c = (u * u + v * v - F.lit(2.0) * rho * u * v) / (
        F.lit(2.0) * (F.lit(1.0) - rho * rho)
    )
    ok = (F.col("_na") >= 1) & (F.col("_nb") >= 1) & (
        F.col("_na") + F.col("_nb") >= 3
    )
    return agg.select(
        *by,
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.when(ok, u).alias("u"),
        F.when(ok, v).alias("v"),
        F.when(ok, c).alias("c"),
    )


def youden_cutpoint(
    df: DataFrame,
    by: list[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """``(by..., n_pos, n_neg, threshold, tpr, fpr, j)`` — the Youden
    J optimal cutpoint (L305): WHERE to threshold a score — the
    decision the scalar AUC (L190-era ``roc_auc``) deliberately
    doesn't make; J = TPR − FPR maximized over the distinct-score
    grid (predict positive at score ≥ t):

        J(t) = P_{≥t}/P − N_{≥t}/N,   t* = argmax J
        (ties → the HIGHER threshold: the conservative cut)

    Counts are exact integers (one descending-prefix window over the
    bounded score grid); TPR/FPR are one division each and the argmax
    is a deterministic (J desc, t desc) window pick.  A side with
    zero examples → NULL.

    Scale shape: one (keys, score) cell groupBy + one window pass —
    the L190 grid shape.

    No reference counterpart; ML-eval analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    lab = F.col(label_col).cast("int")
    cells = flt.groupBy(*by, F.col(score_col).alias("_t")).agg(
        F.sum(lab).alias("_p"),
        F.sum(F.lit(1) - lab).alias("_n"),
    )
    wd = Window.partitionBy(*by).orderBy(F.desc("_t"))
    wdp = wd.rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = cells.select(
        *by,
        "_t",
        F.sum("_p").over(wdp).alias("_cp"),
        F.sum("_n").over(wdp).alias("_cn"),
        F.sum("_p").over(wa).alias("n_pos"),
        F.sum("_n").over(wa).alias("n_neg"),
    )
    tpr = F.col("_cp").cast("double") / F.col("n_pos").cast("double")
    fpr = F.col("_cn").cast("double") / F.col("n_neg").cast("double")
    j = tpr - fpr
    staged = scored.filter(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    ).select(
        *by, "_t", "n_pos", "n_neg",
        tpr.alias("tpr"), fpr.alias("fpr"), j.alias("_j"),
    )
    wr = Window.partitionBy(*by).orderBy(
        F.desc("_j"), F.desc("_t")
    )
    top = staged.select(
        *by, "_t", "n_pos", "n_neg", "tpr", "fpr", "_j",
        F.row_number().over(wr).alias("_rn"),
    ).filter(F.col("_rn") == 1)
    return top.select(
        *by,
        "n_pos",
        "n_neg",
        F.col("_t").cast("double").alias("threshold"),
        "tpr",
        "fpr",
        F.col("_j").alias("j"),
    )


def pr_auc(
    df: DataFrame,
    by: list[str],
    label_col: str,
    score_col: str,
    max_points: int = 10_000,
) -> DataFrame:
    """``(by..., n_pos, n_neg, k_thresholds, ap)`` — area under the
    precision-recall curve as step-interpolated average precision
    (L306, the sklearn AP convention): the imbalance-honest companion
    to ROC-AUC — with 0.1% positives a classifier can hold AUC 0.99
    while precision collapses, and only the PR view shows it:

        AP = Σ_t (R_t − R_{t−1}) · P_t   over descending thresholds

    Counts come from one descending-prefix window over the distinct-
    score grid (exact integers; grids above ``max_points`` refused —
    quantize scores first); the AP sum is an order-pinned fold over
    the collected grid because its terms are float products.  A side
    with zero examples → NULL ap.

    Scale shape: one (keys, score) cell groupBy + one window pass +
    one bounded fold.

    No reference counterpart; ML-eval analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    lab = F.col(label_col).cast("int")
    cells = flt.groupBy(*by, F.col(score_col).alias("_t")).agg(
        F.sum(lab).alias("_p"),
        F.sum(F.lit(1) - lab).alias("_n"),
    )
    sizes = cells.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_points).count()
        if over:
            raise ValueError(
                f"pr_auc: a score grid exceeds max_points={max_points} — "
                "quantize scores first"
            )
    wd = Window.partitionBy(*by).orderBy(F.desc("_t"))
    wdp = wd.rowsBetween(Window.unboundedPreceding, 0)
    pre = cells.select(
        *by,
        "_t",
        F.sum("_p").over(wdp).alias("_cp"),
        F.sum("_n").over(wdp).alias("_cn"),
    )
    scored = pre.select(
        *by,
        "_t",
        "_cp",
        "_cn",
        F.lag("_cp", 1).over(wd).alias("_cpl"),
    )
    packed = scored.groupBy(*by).agg(
        F.max("_cp").alias("n_pos"),
        F.max("_cn").alias("n_neg"),
        F.count(F.lit(1)).alias("k_thresholds"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("_t")).alias("_o"),
                    F.col("_cp").alias("cp"),
                    F.coalesce(F.col("_cpl"), F.lit(0)).alias("cpl"),
                    F.col("_cn").alias("cn"),
                )
            )
        ).alias("_lv"),
    )
    pd_ = F.col("n_pos").cast("double")
    ap = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (
            (e["cp"] - e["cpl"]).cast("double") / pd_
        )
        * (
            e["cp"].cast("double")
            / (e["cp"] + e["cn"]).cast("double")
        ),
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return packed.select(
        *by,
        "n_pos",
        "n_neg",
        "k_thresholds",
        F.when(ok, ap).alias("ap"),
    )


def median_ci(
    df: DataFrame,
    by: list[str],
    value_col: str,
    z: float = 1.96,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, median, ci_lo, ci_hi, lo_rank, hi_rank)`` — the
    distribution-free median confidence interval (L331): order-
    statistic bounds from the binomial rank argument (normal
    approximation) — no distributional assumption, no resampling:

        L = ⌊(n − z·√n)/2⌋,  U = ⌈1 + (n + z·√n)/2⌉  (clamped to
        [1, n]);  CI = (x₍L₎, x₍U₎)

    The median is the exact order statistic (the L162 floored-index
    convention, even counts average the two middle values); the
    bound ranks are one fixed tree each and the lookups are
    positional.  n < 2 → NULL interval.

    Scale shape: one keyed window sort + positional filters.

    No reference counterpart; robust-statistics analytics per SURVEY
    §2.11.
    """
    if not z > 0:
        raise ValueError("median_ci: z must be > 0")
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull())
    wt = Window.partitionBy(*by).orderBy(value_col)
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = flt.select(
        *by,
        F.col(value_col).cast(dec).alias("_x"),
        F.row_number().over(wt).alias("_r"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    nd = F.col("_n").cast("double")
    zl = F.lit(float(z))
    lo = F.greatest(
        F.lit(1),
        F.floor((nd - zl * F.sqrt(nd)) / F.lit(2.0)).cast("long"),
    )
    hi = F.least(
        F.col("_n"),
        F.ceil(
            F.lit(1.0) + (nd + zl * F.sqrt(nd)) / F.lit(2.0)
        ).cast("long"),
    )
    mid_lo = F.floor((F.col("_n") + 1) / 2).cast("long")
    mid_hi = (F.floor(F.col("_n") / 2) + 1).cast("long")
    agg = ranked.groupBy(*by).agg(
        F.max("_n").alias("n"),
        F.max(F.when(F.col("_r") == lo, F.col("_x"))).alias("_xl"),
        F.max(F.when(F.col("_r") == hi, F.col("_x"))).alias("_xh"),
        F.max(F.when(F.col("_r") == mid_lo, F.col("_x"))).alias(
            "_ml"
        ),
        F.max(F.when(F.col("_r") == mid_hi, F.col("_x"))).alias(
            "_mh"
        ),
        F.max(lo).alias("lo_rank"),
        F.max(hi).alias("hi_rank"),
    )
    med = F.when(
        F.col("n") % 2 == 1, F.col("_mh").cast("double")
    ).otherwise(
        (F.col("_ml").cast("double") + F.col("_mh").cast("double"))
        / F.lit(2.0)
    )
    ok = F.col("n") >= 2
    return agg.select(
        *by,
        "n",
        med.alias("median"),
        F.when(ok, F.col("_xl").cast("double")).alias("ci_lo"),
        F.when(ok, F.col("_xh").cast("double")).alias("ci_hi"),
        F.when(ok, F.col("lo_rank")).alias("lo_rank"),
        F.when(ok, F.col("hi_rank")).alias("hi_rank"),
    )


def chatterjee_xi(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """``(by..., n, xi)`` — Chatterjee's ξ correlation (L332,
    Chatterjee 2020): detects ANY functional dependence of y on x —
    ξ → 1 iff y is a measurable function of x, 0 under independence;
    unlike symmetric dCor (L301) it is DIRECTIONAL (y|x), the right
    shape for "is this feature predictive".  Ties-robust form:

        ξ = 1 − n·Σᵢ|r_{i+1} − r_i| / (2·Σᵢ l_i·(n − l_i))

    with rows in x-order (ties in x broken by y — a DETERMINISTIC
    stand-in for Chatterjee's random tie-break, documented),
    rᵢ = #{y_j ≤ yᵢ}, lᵢ = #{y_j ≥ yᵢ} — all exact integer counts
    from RANGE-framed windows; the two sums are plain combinable
    integer sums and ξ is one division.  Degenerate (constant y) →
    NULL.

    Scale shape: two value-ordered window passes + one x-ordered
    window pass + one combinable agg — keyed exchanges only.

    No reference counterpart; dependence analytics per SURVEY §2.11.
    """
    d0 = "decimal(38,0)"
    flt = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    wyr = (
        Window.partitionBy(*by)
        .orderBy(F.col(y_col))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wyl = (
        Window.partitionBy(*by)
        .orderBy(F.col(y_col).desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = flt.select(
        *by,
        F.col(x_col).alias("_xv"),
        F.col(y_col).alias("_yv"),
        F.count(F.lit(1)).over(wyr).alias("_r"),
        F.count(F.lit(1)).over(wyl).alias("_l"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    wx = Window.partitionBy(*by).orderBy("_xv", "_yv")
    led = ranked.select(
        *by,
        "_n",
        "_r",
        "_l",
        F.lead("_r", 1).over(wx).alias("_rn"),
    )
    agg = led.groupBy(*by, "_n").agg(
        F.sum(
            F.when(
                F.col("_rn").isNotNull(),
                F.abs(F.col("_rn") - F.col("_r")).cast(d0),
            )
        ).alias("_num"),
        F.sum(
            F.col("_l").cast(d0)
            * (F.col("_n") - F.col("_l")).cast(d0)
        ).alias("_den"),
    )
    nd = F.col("_n").cast("double")
    xi = F.lit(1.0) - nd * F.col("_num").cast("double") / (
        F.lit(2.0) * F.col("_den").cast("double")
    )
    ok = F.col("_den") > F.lit(0).cast(d0)
    return agg.select(
        *by,
        F.col("_n").alias("n"),
        F.when(ok, xi).alias("xi"),
    )


def rrf_fusion(
    df: DataFrame,
    by: list[str],
    system_col: str,
    doc_col: str,
    rank_col: str,
    systems: list[str],
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (L443): ``(by..., doc, n_systems, score,
    rank)`` — THE standard hybrid-retrieval merger (Cormack et al.
    2009; how BM25 L22 and ANN L7-L9 lists become one ranking —
    including this repo's own hybrid-search story):

        score(d) = Σ_systems 1/(k + rank_s(d))

    The system list is a bounded pinned parameter (1..16, the fused
    run names — an unknown system in the data is REFUSED, a missing
    (system, doc) contributes nothing), so the per-doc sum is a FIXED
    tree folded in the pinned system-list order — identical doubles
    both engines, and the (score DESC, doc ASC) final ranking cannot
    knife-edge.  Duplicate (system, doc) rows are REFUSED (two ranks
    from one run is a bug); ranks must be ≥ 1.  ``top_n`` bounds the
    fused output per key.

    Scale shape: one pivot-style conditional agg per (keys, doc) +
    one top-n window.

    No reference counterpart (generalizes the L365-adjacent hybrid
    blend in `search.py`); retrieval analytics per SURVEY §2.11."""
    if not systems or len(systems) > 16:
        raise ValueError("rrf_fusion: need 1..16 systems")
    if len(set(systems)) != len(systems):
        raise ValueError("rrf_fusion: duplicate system names")
    if k < 0 or top_n < 1:
        raise ValueError("rrf_fusion: k must be >= 0, top_n >= 1")
    from .validate import validation_enabled

    if validation_enabled():
        bad = df.filter(
            F.col(system_col).isNull()
            | F.col(doc_col).isNull()
            | F.col(rank_col).isNull()
            | (F.col(rank_col) < 1)
        ).count()
        if bad:
            raise ValueError(
                f"rrf_fusion: {bad} NULL/invalid-rank row(s)"
            )
        if validation_enabled():
            unknown = df.filter(~F.col(system_col).isin(systems)).count()
            if unknown:
                raise ValueError(
                    f"rrf_fusion: {unknown} row(s) from systems outside the "
                    "pinned list"
                )
        if validation_enabled():
            dup = (
                df.groupBy(*by, system_col, doc_col)
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"rrf_fusion: {dup} duplicate (system, doc) row(s)"
                )
    aggs = [F.count(F.lit(1)).alias("n_systems")]
    for i, s in enumerate(systems):
        aggs.append(
            F.min(
                F.when(
                    F.col(system_col) == s, F.col(rank_col)
                )
            ).alias(f"_r{i}")
        )
    cells = df.groupBy(*by, F.col(doc_col).alias("doc")).agg(*aggs)
    score = None
    for i, s in enumerate(systems):
        term = F.when(
            F.col(f"_r{i}").isNotNull(),
            F.lit(1.0)
            / (F.lit(float(k)) + F.col(f"_r{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy(*by).orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    return (
        cells.select(*by, "doc", "n_systems", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def rank_biased_precision(
    df: DataFrame,
    by: list[str],
    rank_col: str,
    rel_col: str,
    p: str = "0.8",
    max_depth: int = 1000,
) -> DataFrame:
    """Rank-biased precision (L444): ``(by..., depth, rbp,
    residual)`` — the PERSISTENCE-model ranking metric completing the
    retrieval scoreboard (P@k L164 is a cliff at k, NDCG L221 and ERR
    L372 model graded gain; RBP models a user who continues down the
    list with probability p — Moffat & Zobel 2008 — and uniquely
    reports its own UNCERTAINTY from the unjudged tail):

        RBP = (1−p)·Σ_d p^{d−1}·rel_d
        residual = p^{depth} + (1−p)·Σ_{unjudged d ≤ depth} p^{d−1}
                 = p^{depth} + Σ_{gaps (a..b)} (p^{a−1} − p^{b})

    i.e. the score still reachable from EVERY unjudged position: the
    tail below the evaluated depth PLUS any rank gaps inside
    1..depth (judged-only input need not be contiguous — gaps are
    unjudged documents, and scoring them as rel = 0 without charging
    the residual would understate the Moffat-Zobel uncertainty
    bound; r4 ADVICE).  The gap mass uses the TELESCOPED geometric
    identity (1−p)·Σ_{j=a..b} p^{j−1} = p^{a−1} − p^{b} — the naive
    1 − (1−p)·Σ_judged form loses ~11 digits to cancellation when
    rbp ≈ 1 (measured: a 1-ulp fold difference became 1e-11 in the
    residual), while each telescoped term is exactly 0.0 for
    contiguous ranks on both engines.  rbp + residual ≤ 1 for
    VALIDATED input (equality when every judged document is
    relevant); with validation disabled (``skip_validation()``)
    duplicate ranks make the fold's prev == d and ranks beyond
    ``max_depth`` go unchecked, so negative telescoped terms can
    silently break the invariant — caller-beware, like every gated
    guard (ADVICE r5).

    ``p`` is a decimal STRING pinned into the plan; the geometric
    weights fold over the judged ranks in ASCENDING-rank order
    (bounded by ``max_depth``, refused beyond) with p^{d−1} spelled
    exp((d−1)·ln p) — one pinned tree per term, both engines.
    Binary relevance validated (the L191 rule); duplicate ranks
    refused; per-query rows on purpose (means are the caller's).

    No reference counterpart; retrieval analytics per SURVEY §2.11."""
    from decimal import Decimal

    from .validate import assert_binary, validation_enabled

    pv = Decimal(p)
    if not (Decimal(0) < pv < Decimal(1)):
        raise ValueError("rank_biased_precision: p must be in (0,1)")
    assert_binary(df, rel_col, "rank_biased_precision")
    if validation_enabled():
        bad = df.filter(
            F.col(rank_col).isNull() | (F.col(rank_col) < 1)
        ).count()
        if bad:
            raise ValueError(
                f"rank_biased_precision: {bad} NULL/invalid rank(s)"
            )
        if validation_enabled():
            dup = (
                df.groupBy(*by, rank_col)
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"rank_biased_precision: {dup} duplicate rank(s)"
                )
        if validation_enabled():
            deep = df.filter(F.col(rank_col) > max_depth).count()
            if deep:
                raise ValueError(
                    f"rank_biased_precision: {deep} row(s) deeper than "
                    f"max_depth={max_depth}"
                )
    pd_ = float(pv)
    packed = df.groupBy(*by).agg(
        F.max(F.col(rank_col)).alias("depth"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(rank_col).cast("long").alias("d"),
                    F.col(rel_col).cast("int").alias("r"),
                )
            )
        ).alias("_a"),
    )
    lnp = F.lit(float(pv))
    term_sum = F.aggregate(
        F.col("_a"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.when(
            e["r"] == 1,
            F.exp(
                (e["d"] - F.lit(1)).cast("double")
                * F.log(lnp)
            ),
        ).otherwise(F.lit(0.0)),
    )
    rbp = (F.lit(1.0) - lnp) * term_sum
    # residual over ALL unjudged positions: tail p^depth + one exact
    # telescoped term per inter-judged gap, folded in ascending-rank
    # order with the previous judged rank carried in the accumulator
    gap_sum = F.aggregate(
        F.col("_a"),
        F.struct(
            F.lit(0).cast("long").alias("prev"), F.lit(0.0).alias("s")
        ),
        lambda acc, e: F.struct(
            e["d"].alias("prev"),
            (
                acc["s"]
                + (
                    F.exp(acc["prev"].cast("double") * F.log(lnp))
                    - F.exp(
                        (e["d"] - F.lit(1)).cast("double") * F.log(lnp)
                    )
                )
            ).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    residual = (
        F.exp(F.col("depth").cast("double") * F.log(lnp)) + gap_sum
    )
    return packed.select(
        *by,
        "depth",
        rbp.alias("rbp"),
        residual.alias("residual"),
    )
