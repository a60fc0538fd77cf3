"""Leave-one-out target encoding (L138): the feature-engineering
workhorse for high-cardinality categoricals — each row's category is
replaced by the mean target of the OTHER rows in that category
(Micci-Barreca 2001, the LOO variant), so the encoding never leaks the
row's own label:

    te_i = (S_c − y_i) / (n_c − 1)          when n_c > 1
    te_i = S / n   (global target mean)     when n_c = 1

Exactness discipline (the L135 stance): S_c and S are EXACT DECIMAL
sums (order-insensitive — float SUM is not), the numerator subtraction
stays decimal (exact), and only the final single division runs in
IEEE doubles — so every encoded value is bit-identical across engines
and partitionings with no rounding grid.

Scale shape: one combinable groupBy(category) + one equi-join back on
the category + a 1-row global aggregate folded in as a broadcast —
two keyed shuffles on the same key; stat tables are bounded by
category cardinality.

No reference counterpart; feature-engineering per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "te",
    scale: int = 2,
) -> DataFrame:
    """``(df.*, te)`` — leave-one-out target encoding of ``cat_col``
    against ``target_col``.  The target must be exactly representable
    at ``DECIMAL(18, scale)`` (cents-style data at the default);
    NULL targets/categories are excluded from the sums and encode to
    the global mean / NULL respectively."""
    dec = f"decimal(18,{scale})"
    yd = F.col(target_col).cast(dec)
    vals = df.filter(
        F.col(cat_col).isNotNull() & F.col(target_col).isNotNull()
    )
    stats = vals.groupBy(F.col(cat_col).alias("_cat")).agg(
        F.sum(yd).alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    glob = vals.agg(
        F.sum(yd).alias("_gs"), F.count(F.lit(1)).alias("_gn")
    )
    enc = (
        df.join(
            stats, F.col(cat_col).eqNullSafe(F.col("_cat")), "left"
        )
        .drop("_cat")
        .crossJoin(F.broadcast(glob))
    )
    loo = (F.col("_s") - yd).cast("double") / (
        (F.col("_n") - F.lit(1)).cast("double")
    )
    global_mean = F.col("_gs").cast("double") / F.col("_gn").cast("double")
    te = (
        F.when(F.col(target_col).isNull() | F.col(cat_col).isNull(), None)
        .when(F.col("_n") > 1, loo)
        .otherwise(global_mean)
    )
    return enc.withColumn(out_col, te).drop("_s", "_n", "_gs", "_gn")


def best_split(
    df: "DataFrame",
    by: list[str],
    feature_col: str,
    target_col: str,
) -> "DataFrame":
    """``(by..., n, n_pos, base_gini, threshold, gain, n_left,
    pos_left)`` — the decision-stump split finder (L237): the single
    numeric threshold that best separates a binary target by Gini
    impurity decrease — the classic feature-screening primitive (CART
    step 1) that ranks features for a 100 TB training table without
    training anything.

        gini(n, p) = 1 − (p/n)² − ((n−p)/n)²
        gain(v)    = gini(N, P) − (n_L/N)·gini_L − (n_R/N)·gini_R

    over candidate thresholds = the feature's DISTINCT values (left =
    ≤ v; the last value is excluded — empty right).  Counts and prefix
    sums are exact integers from one (keys, value) groupBy + one keyed
    window (the L146 shape); every gini/gain is a fixed IEEE tree; the
    argmax is an exact struct max with SMALLEST-threshold tiebreak
    (deterministic).  Non-binary targets are refused loudly (L191
    discipline).  A constant feature (single distinct value) has no
    candidate split and the key is omitted.

    Scale shape: one combinable groupBy + one keyed window over the
    bounded distinct-value grid — bucket continuous features first
    (the L159 discipline).  100 TB scans once.

    No reference counterpart; ML-screening analytics per SURVEY §2.11.
    """
    from pyspark.sql import Window

    flt = df.filter(
        F.col(feature_col).isNotNull() & F.col(target_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(~F.col(target_col).isin([0, 1])).count()
        if n_bad:
            raise ValueError(
                f"best_split: {n_bad} non-binary value(s) in {target_col!r}"
            )
    per = flt.groupBy(*by, F.col(feature_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_nv"),
        F.sum(F.col(target_col).cast("long")).alias("_pv"),
    )
    wk = Window.partitionBy(*by).orderBy("_v")
    wkp = wk.rowsBetween(Window.unboundedPreceding, 0)
    wka = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pre = per.select(
        *by,
        "_v",
        F.sum("_nv").over(wkp).alias("_nl"),
        F.sum("_pv").over(wkp).alias("_pl"),
        F.sum("_nv").over(wka).alias("_n"),
        F.sum("_pv").over(wka).alias("_p"),
    ).filter(F.col("_nl") < F.col("_n"))

    def _gini(n, p):
        nd, pd_ = n.cast("double"), p.cast("double")
        q = pd_ / nd
        r = (nd - pd_) / nd
        return F.lit(1.0) - q * q - r * r

    base = _gini(F.col("_n"), F.col("_p"))
    gl = _gini(F.col("_nl"), F.col("_pl"))
    gr = _gini(F.col("_n") - F.col("_nl"), F.col("_p") - F.col("_pl"))
    nld = F.col("_nl").cast("double")
    nd_ = F.col("_n").cast("double")
    nrd = (F.col("_n") - F.col("_nl")).cast("double")
    gain = (base - (nld / nd_) * gl) - (nrd / nd_) * gr
    cand = pre.select(
        *by,
        F.col("_n"),
        F.col("_p"),
        base.alias("_bg"),
        F.struct(
            gain.alias("g"),
            (-F.col("_v").cast("double")).alias("nv"),
            F.col("_v").alias("v"),
            F.col("_nl").alias("nl"),
            F.col("_pl").alias("pl"),
        ).alias("_s"),
    )
    best = cand.groupBy(*by, "_n", "_p", "_bg").agg(F.max("_s").alias("_b"))
    return best.select(
        *by,
        F.col("_n").alias("n"),
        F.col("_p").alias("n_pos"),
        F.col("_bg").alias("base_gini"),
        F.col("_b.v").alias("threshold"),
        F.col("_b.g").alias("gain"),
        F.col("_b.nl").alias("n_left"),
        F.col("_b.pl").alias("pos_left"),
    )


def eb_beta_binomial(
    df: DataFrame,
    by: list[str],
    key_col: str,
    succ_col: str,
    trial_col: str,
    max_keys: int = 100_000,
) -> DataFrame:
    """``(by..., key, s, t, raw_rate, alpha, beta, shrunk_rate)`` —
    empirical-Bayes beta-binomial shrinkage (L284): stabilize
    per-key rates (CTR per item, precision per entity class, defect
    rate per supplier) by fitting a Beta prior to the OBSERVED rate
    distribution via method of moments and posterior-averaging each
    key toward it:

        m = mean(rᵢ),  v = var(rᵢ)  (sample, over keys)
        α+β = m(1−m)/v − 1,   α = m·(α+β)
        shrunk = (s + α)/(t + α + β)

    — the low-traffic key moves most, the high-traffic key barely
    moves, which is exactly the leaderboard/ranking stabilizer the
    raw rate cannot be (the LOO target encoder L138 is the
    supervised cousin).  The key grid per group is BOUNDED
    (``max_keys``, refused beyond): mean/var over keys are
    order-pinned folds over the sorted key list, then one fixed tree;
    a degenerate prior (v = 0, or v ≥ m(1−m), or k < 2) yields NULL
    α/β/shrunk — shrinkage needs a nondegenerate fit, silently
    passing raw through would hide it.  Zero-trial keys refused.

    Scale shape: one combinable (keys, key) cell agg + one bounded
    fold + an in-row explode back to keys — one scan, one shuffle.

    No reference counterpart; estimation analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(key_col).isNotNull()
        & F.col(succ_col).isNotNull()
        & F.col(trial_col).isNotNull()
    )
    cells = flt.groupBy(*by, F.col(key_col).alias("key")).agg(
        F.sum(succ_col).alias("s"), F.sum(trial_col).alias("t")
    )
    if validation_enabled():
        bad = cells.filter(
            (F.col("t") <= 0) | (F.col("s") < 0) | (F.col("s") > F.col("t"))
        ).count()
        if bad:
            raise ValueError(
                f"eb_beta_binomial: {bad} key(s) with t<=0 or s outside "
                "[0, t]"
            )
    sizes = cells.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_keys).count()
        if over:
            raise ValueError(
                f"eb_beta_binomial: a group exceeds max_keys={max_keys}"
            )
    packed = cells.groupBy(*by).agg(
        F.count(F.lit(1)).alias("k"),
        F.sort_array(F.collect_list(F.struct("key", "s", "t"))).alias(
            "_lv"
        ),
    )
    kd = F.col("k").cast("double")
    rate = lambda e: e["s"].cast("double") / e["t"].cast("double")
    m = (
        F.aggregate(
            F.col("_lv"), F.lit(0.0), lambda a, e: a + rate(e)
        )
        / kd
    )
    s1 = packed.select(*by, "k", "_lv", m.alias("_m"))
    v = F.when(
        F.col("k") >= 2,
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a, e: a
            + (rate(e) - F.col("_m")) * (rate(e) - F.col("_m")),
        )
        / (kd - F.lit(1.0)),
    )
    s2 = s1.select(*by, "k", "_lv", "_m", v.alias("_v"))
    mm = F.col("_m") * (F.lit(1.0) - F.col("_m"))
    ab = F.when(
        (F.col("k") >= 2)
        & (F.col("_v") > 0.0)
        & (mm > F.col("_v")),
        mm / F.col("_v") - F.lit(1.0),
    )
    s3 = s2.select(
        *by,
        "_lv",
        ab.alias("_ab"),
        (F.col("_m") * ab).alias("_alpha"),
    )
    ex = s3.select(
        *by, "_ab", "_alpha", F.explode("_lv").alias("_e")
    )
    sd = F.col("_e")["s"].cast("double")
    td = F.col("_e")["t"].cast("double")
    return ex.select(
        *by,
        F.col("_e")["key"].alias("key"),
        F.col("_e")["s"].alias("s"),
        F.col("_e")["t"].alias("t"),
        (sd / td).alias("raw_rate"),
        F.col("_alpha").alias("alpha"),
        (F.col("_ab") - F.col("_alpha")).alias("beta"),
        ((sd + F.col("_alpha")) / (td + F.col("_ab"))).alias(
            "shrunk_rate"
        ),
    )
