"""Probability calibration diagnostics (L166): the Brier score and the
reliability (calibration-bin) table — is a model's 0.8 actually an 80%
event rate?  The standard companion to the ROC-AUC (L146) scoreboard:
AUC measures ranking, calibration measures the probabilities
themselves.

Exactness contract: probabilities must be exactly representable at
DECIMAL(12, scale) (callers emitting float scores quantize first —
a calibration table is bucketed anyway, so the quantization IS the
analysis grid).  Then every accumulated quantity is exact decimal —
(p − y)² per row, per-bin Σp and Σy — and each output value is ONE
IEEE division:

    brier = Σ(p−y)² / n,   bin  = min(⌊p·B⌋, B−1)
    mean_pred = Σp/n_b,    frac_pos = Σy/n_b

Out-of-range probabilities are REFUSED (a silent clamp would hide a
broken score pipeline).  Scale shape: one combinable groupBy (bins
are bounded); 100 TB scanned once.

No reference counterpart; evaluation analytics per SURVEY §2.11
(composes with L146 ROC-AUC and L165 classification report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def _prepared(df, prob_col, label_col, scale):
    dec = f"decimal(12,{scale})"
    flt = df.filter(F.col(prob_col).isNotNull() & F.col(label_col).isNotNull())
    p = F.col(prob_col).cast(dec)
    out = flt.select(p.alias("_p"), F.col(label_col).cast("int").alias("_y"))
    if validation_enabled():
        n_bad = out.filter(
            (F.col("_p") < 0) | (F.col("_p") > 1) | ~F.col("_y").isin([0, 1])
        ).count()
        if n_bad:
            raise ValueError(
                f"calibration: {n_bad} row(s) with probability outside [0,1] "
                "or non-binary label — fix the score pipeline; clamping "
                "silently would hide it"
            )
    return out


def brier_score(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, brier)`` — mean squared probability error, the
    numerator an exact decimal sum, ONE division."""
    base = _prepared(df, prob_col, label_col, scale)
    diff = F.col("_p") - F.col("_y").cast(f"decimal(12,{scale})")
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(diff * diff).alias("_ss"),
    )
    return agg.select(
        "n",
        F.when(
            F.col("n") > 0,
            F.col("_ss").cast("double") / F.col("n").cast("double"),
        ).alias("brier"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 4,
) -> DataFrame:
    """``(bin, n, mean_pred, frac_pos)`` — the reliability table; a
    well-calibrated model has mean_pred ≈ frac_pos per bin."""
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    base = _prepared(df, prob_col, label_col, scale)
    bin_ = F.least(
        F.floor(F.col("_p") * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = base.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_p").alias("_sp"),
        F.sum("_y").alias("_sy"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "bin",
        "n",
        (F.col("_sp").cast("double") / nd).alias("mean_pred"),
        (F.col("_sy").cast("double") / nd).alias("frac_pos"),
    )


def isotonic_fit(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 50,
    scale: int = 4,
) -> DataFrame:
    """``(bin, n, mean_pred, frac_pos, iso)`` — monotone (isotonic)
    calibration of a score column: the reliability table (L166) plus
    the pool-adjacent-violators fit, the standard way to turn a raw
    model score into a calibrated probability without assuming a
    parametric shape (Zadrozny & Elkan 2002).

    Rather than the sequential PAV stack (inherently serial), the fit
    uses the MINIMAX identity — over occupied bins ordered by index,

        iso_i = max_{j≤i} min_{k≥i} (Σ_{b∈[j,k]} y_b)/(Σ_{b∈[j,k]} n_b)

    — which is embarrassingly parallel over the BOUNDED bin grid:
    prefix sums are exact integers, every interval mean is ONE IEEE
    division of exactly-representable integers (identical doubles in
    every engine), and min/max of identical doubles is deterministic
    — bit-identical, ungridded.  Cost is O(B³) pairs on a B ≤ a few
    hundred grid — a broadcast-sized triple join that never touches
    the fact table again.

    Binning and input validation follow ``calibration_bins`` exactly
    (bin = min(⌊p·B⌋, B−1); out-of-range probabilities REFUSED).
    Empty bins are absent — the fit runs over the occupied
    subsequence, which preserves monotonicity in p.

    Scale shape: one combinable groupBy over the fact table; the
    minimax runs on the B-row bin table (broadcast joins, no second
    fact scan).
    """
    if n_bins < 1:
        raise ValueError("isotonic_fit: n_bins must be >= 1")
    base = _prepared(df, prob_col, label_col, scale)
    bin_ = F.least(
        F.floor(F.col("_p") * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = base.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_p").alias("_sp"),
        F.sum("_y").alias("_sy"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = agg.select(
        "bin",
        "n",
        "_sp",
        "_sy",
        F.sum("n").over(w).alias("_cw"),
        F.sum("_sy").over(w).alias("_cs"),
    )
    lo = pre.select(
        F.col("bin").alias("_j"),
        (F.col("_cw") - F.col("n")).alias("_cw0"),
        (F.col("_cs") - F.col("_sy")).alias("_cs0"),
    )
    hi = pre.select(
        F.col("bin").alias("_k"),
        F.col("_cw").alias("_cw1"),
        F.col("_cs").alias("_cs1"),
    )
    pairs = (
        F.broadcast(lo)
        .crossJoin(F.broadcast(hi))
        .filter(F.col("_j") <= F.col("_k"))
        .select(
            "_j",
            "_k",
            (
                (F.col("_cs1") - F.col("_cs0")).cast("double")
                / (F.col("_cw1") - F.col("_cw0")).cast("double")
            ).alias("_m"),
        )
    )
    idx = pre.select(F.col("bin").alias("_i"))
    inner = (
        F.broadcast(idx)
        .crossJoin(F.broadcast(pairs))
        .filter((F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i")))
        .groupBy("_i", "_j")
        .agg(F.min("_m").alias("_inner"))
    )
    iso = inner.groupBy("_i").agg(F.max("_inner").alias("iso"))
    nd = F.col("n").cast("double")
    return (
        pre.join(iso, pre["bin"] == iso["_i"])
        .select(
            "bin",
            "n",
            (F.col("_sp").cast("double") / nd).alias("mean_pred"),
            (F.col("_sy").cast("double") / nd).alias("frac_pos"),
            "iso",
        )
    )


def conformal_quantile(
    df: DataFrame,
    by: list[str],
    score_col: str,
    alpha: str = "0.1",
) -> DataFrame:
    """``(by..., n, k, qhat)`` — the split-conformal calibration
    quantile (Vovk et al.; Angelopoulos & Bates 2023 tutorial form):
    given a calibration set of nonconformity scores per group,

        k = ⌈(n + 1)·(1 − α)⌉,   q̂ = the k-th smallest score

    — predicting with threshold q̂ then guarantees ≥ 1−α marginal
    coverage on exchangeable data.  ``alpha`` is a decimal STRING
    (the L172 weighted-quantile convention) so the (n+1)(1−α)
    threshold is computed in EXACT decimal and the ceiling cannot
    wobble across engines; q̂ is an order statistic — engine-exact,
    no float summation at all.  k > n (α too small for the
    calibration size — the finite-sample guarantee is vacuous)
    yields NULL q̂, loudly.

    Scale shape: one keyed window sort (the semantics) + a broadcast
    of per-group k; 100 TB of scores scans once."""
    import decimal

    try:
        a_val = decimal.Decimal(alpha)
    except decimal.InvalidOperation as exc:
        raise ValueError(
            f"conformal_quantile: unparseable alpha {alpha!r}"
        ) from exc
    if not 0 < a_val < 1:
        raise ValueError(
            f"conformal_quantile: alpha must be in (0,1), got {alpha!r}"
        )
    a = F.lit(alpha).cast("decimal(9,6)")
    flt = df.filter(F.col(score_col).isNotNull()).select(
        *by, F.col(score_col).alias("_s")
    )
    sizes = flt.groupBy(*by).agg(F.count(F.lit(1)).alias("n"))
    sizes = sizes.select(
        *by,
        "n",
        F.ceil(
            (F.col("n").cast("decimal(20,0)") + 1)
            * (F.lit(1).cast("decimal(9,6)") - a)
        ).alias("k"),
    )
    w = Window.partitionBy(*by).orderBy("_s")
    ranked = flt.withColumn("_rn", F.row_number().over(w))
    hit = ranked.join(
        F.broadcast(sizes), list(by)
    ).filter(F.col("_rn") == F.col("k"))
    picked = hit.groupBy(*by).agg(F.max("_s").alias("qhat"))
    return (
        sizes.join(picked, list(by), "left")
        .select(*by, "n", "k", "qhat")
    )


def expected_calibration_error(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, ece, mce)`` — Expected / Maximum Calibration
    Error, the scalar roll-ups of the L166 reliability table (Naeini
    et al. 2015): ECE = Σ_b (n_b/n)·|acc_b − conf_b|, which with
    conf = mean predicted probability collapses EXACTLY to

        ece = Σ_b |Σy_b − Σp_b| / n

    — a sum of absolute differences of exact decimal bin sums, ONE
    IEEE division: bit-identical, ungridded.  MCE is the max per-bin
    gap |Σy_b − Σp_b|/n_b — a max over one-division doubles of exact
    decimals, equally deterministic.  Binning and input validation
    follow ``calibration_bins`` exactly."""
    if n_bins < 1:
        raise ValueError("expected_calibration_error: n_bins must be >= 1")
    base = _prepared(df, prob_col, label_col, scale)
    dec = f"decimal(12,{scale})"
    bin_ = F.least(
        F.floor(F.col("_p") * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = base.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum("_p").alias("_sp"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
    )
    gap = F.abs(F.col("_sy") - F.col("_sp"))
    out = agg.agg(
        F.sum("_nb").alias("n"),
        F.sum(gap).alias("_sgap"),
        F.max(
            gap.cast("double") / F.col("_nb").cast("double")
        ).alias("mce"),
    )
    return out.select(
        "n",
        (F.col("_sgap").cast("double") / F.col("n").cast("double")).alias(
            "ece"
        ),
        "mce",
    )


def quantile_loss(
    df: DataFrame,
    by: list[str],
    actual_col: str,
    pred_col: str,
    q_pct: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, q_pct, pinball, coverage)`` — pinball (quantile)
    loss + empirical coverage (L286): the proper scoring rule for a
    quantile forecast (the L205-era conformal quantiles, the L281/L272
    point forecasts' interval cousins) and the sanity check that a
    τ-quantile prediction actually covers ≈ τ of the actuals:

        pinball = mean( max(τ·(y−q̂), (τ−1)·(y−q̂)) ),  τ = q_pct/100
        coverage = mean( y ≤ q̂ )

    EXACT trick: with τ an integer percent, 100·pinball-term =
    max(q_pct·(y−q̂), (q_pct−100)·(y−q̂)) is an exact DECIMAL for
    DECIMAL(18,scale) inputs — the loss sum is order-insensitive and
    combinable, ONE division at the end (the L151 cross-multiply
    discipline applied to a loss function).  Coverage is an exact
    integer count.  q_pct outside 1..99 refused.

    Scale shape: ONE combinable aggregation — one scan of 100 TB.

    No reference counterpart; forecast-eval analytics per SURVEY
    §2.11.
    """
    if not 1 <= int(q_pct) <= 99:
        raise ValueError("quantile_loss: q_pct must be in 1..99")
    q = int(q_pct)
    dec = f"decimal(18,{scale})"
    d38 = f"decimal(38,{scale})"
    flt = df.filter(
        F.col(actual_col).isNotNull() & F.col(pred_col).isNotNull()
    )
    diff = (
        F.col(actual_col).cast(dec).cast(d38)
        - F.col(pred_col).cast(dec).cast(d38)
    )
    term100 = F.greatest(
        F.lit(q).cast(d38) * diff,
        F.lit(q - 100).cast(d38) * diff,
    )
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(term100).alias("_s100"),
        F.sum(
            (F.col(actual_col).cast(dec) <= F.col(pred_col).cast(dec))
            .cast("long")
        ).alias("_cov"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        *by,
        "n",
        F.lit(q).alias("q_pct"),
        (
            F.col("_s100").cast("double") / (F.lit(100.0) * nd)
        ).alias("pinball"),
        (F.col("_cov").cast("double") / nd).alias("coverage"),
    )


def var_backtest(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    var_col: str,
    p: float = 0.05,
) -> DataFrame:
    """``(by..., n, n_exceptions, rate, lr_pof, lr_ind, lr_cc)`` —
    the VaR exception backtest (L291): does a lower-tail quantile
    forecast (VaR, an SLO floor, a conformal bound L205) fail at the
    PROMISED rate, and do the failures CLUSTER — Kupiec's
    proportion-of-failures LR plus Christoffersen's independence LR
    (clustered exceptions mean the model misses volatility regimes
    even when the overall rate looks right; L290's ARCH is the
    upstream cause):

        exception eₜ = 1{xₜ < VaRₜ}
        LR_pof = −2·[ (n−x)·ln(1−p) + x·ln p
                      − (n−x)·ln(1−x/n) − x·ln(x/n) ]      (df 1)
        LR_ind from the eₜ transition counts n₀₀ n₀₁ n₁₀ n₁₁  (df 1)
        LR_cc  = LR_pof + LR_ind                            (df 2)

    Exceptions and transition counts are EXACT integers (one lag
    window); the LRs are fixed ln trees with the 0·ln0 = 0 convention
    handled by CASE, so x = 0 and x = n stay finite.  Degenerate
    sides (no 0s or no 1s among transitions) → NULL lr_ind.  NULLs
    refused.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; forecast-eval analytics per SURVEY
    §2.11.
    """
    if not (0.0 < p < 1.0):
        raise ValueError("var_backtest: need 0 < p < 1")
    if validation_enabled():
        n_null = df.filter(
            F.col(value_col).isNull() | F.col(var_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"var_backtest: {n_null} NULL value(s) — impute first"
            )
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    e = (F.col(value_col) < F.col(var_col)).cast("int")
    lagged = df.select(
        *by,
        e.alias("_e"),
        F.lag(e, 1).over(wt).alias("_ep"),
    )
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_e").alias("n_exceptions"),
        F.sum(
            F.when((F.col("_ep") == 0) & (F.col("_e") == 0), 1).otherwise(0)
        ).alias("_n00"),
        F.sum(
            F.when((F.col("_ep") == 0) & (F.col("_e") == 1), 1).otherwise(0)
        ).alias("_n01"),
        F.sum(
            F.when((F.col("_ep") == 1) & (F.col("_e") == 0), 1).otherwise(0)
        ).alias("_n10"),
        F.sum(
            F.when((F.col("_ep") == 1) & (F.col("_e") == 1), 1).otherwise(0)
        ).alias("_n11"),
    )
    nd = F.col("n").cast("double")
    xd = F.col("n_exceptions").cast("double")

    def xlnx(cnt, prob):
        return F.when(cnt > 0, cnt.cast("double") * F.log(prob)).otherwise(
            F.lit(0.0)
        )

    rate = xd / nd
    lr_pof = F.lit(-2.0) * (
        xlnx(F.col("n") - F.col("n_exceptions"), F.lit(1.0 - p))
        + xlnx(F.col("n_exceptions"), F.lit(float(p)))
        - xlnx(
            F.col("n") - F.col("n_exceptions"),
            F.lit(1.0) - rate,
        )
        - xlnx(F.col("n_exceptions"), rate)
    )
    t0 = F.col("_n00") + F.col("_n01")
    t1 = F.col("_n10") + F.col("_n11")
    tt = t0 + t1
    pi_ = (F.col("_n01") + F.col("_n11")).cast("double") / tt.cast(
        "double"
    )
    pi0 = F.col("_n01").cast("double") / t0.cast("double")
    pi1 = F.col("_n11").cast("double") / t1.cast("double")
    ll0 = xlnx(F.col("_n00") + F.col("_n10"), F.lit(1.0) - pi_) + xlnx(
        F.col("_n01") + F.col("_n11"), pi_
    )
    ll1 = (
        xlnx(F.col("_n00"), F.lit(1.0) - pi0)
        + xlnx(F.col("_n01"), pi0)
        + xlnx(F.col("_n10"), F.lit(1.0) - pi1)
        + xlnx(F.col("_n11"), pi1)
    )
    lr_ind = F.lit(-2.0) * (ll0 - ll1)
    ok_pof = F.col("n") >= 2
    ok_ind = (t0 > 0) & (t1 > 0) & (tt >= 2)
    return agg.select(
        *by,
        "n",
        "n_exceptions",
        rate.alias("rate"),
        F.when(ok_pof, lr_pof).alias("lr_pof"),
        F.when(ok_ind, lr_ind).alias("lr_ind"),
        F.when(ok_pof & ok_ind, lr_pof + lr_ind).alias("lr_cc"),
    )


def hosmer_lemeshow(
    df: DataFrame,
    by: list[str],
    prob_col: str,
    label_col: str,
    order_cols: list[str],
    g: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit test (L375): ``(by..., n,
    g_bins, hl_stat, df)`` — the decile-of-risk calibration GOF that
    turns the L166 reliability table into a single tested number: bin
    rows into ``g`` equal-count groups of ascending predicted
    probability and compare observed vs expected event counts,

        HL = Σ_b (O_b − E_b)² / (E_b·(1 − E_b/n_b)),   df = g_occ − 2

    (Hosmer & Lemeshow 1980).  Under a well-calibrated model HL ~
    χ²(df); a large HL says the probabilities are mis-scaled even if
    the ranking (L146 AUC) is fine.

    Determinism contract: probabilities quantize to
    ``DECIMAL(12, scale)`` (the L166 contract — out-of-range REFUSED),
    so per-bin Σp and Σy are EXACT and order-insensitive; binning is
    by ``row_number() OVER (ORDER BY p, order_cols...)`` with
    ``bin = ((rn−1)·g) div n`` — exact integer arithmetic over a
    caller-guaranteed total order (``order_cols`` must break all
    ties, the L374 contract; equal-count-by-construction sidesteps
    ntile's arbitrary tie placement, refused in L337).  The χ² fold
    runs in ascending-bin order over the bounded bin array, so every
    engine adds the same IEEE terms in the same order.

    NULL ``hl_stat``/``df`` when undefined: fewer than 3 occupied
    bins (df ≤ 0), or any bin with E_b ≤ 0 or E_b ≥ n_b (an all-zero
    or all-one expected bin makes the term's variance denominator
    vanish — the test is undefined there, not infinite).

    Scale shape: ONE keyed window exchange (the rank), then a
    combinable (by, bin) groupBy, then a ≤g-length in-row fold —
    100 TB is scanned once and the wide rows are g structs."""
    if not 3 <= g <= 1000:
        raise ValueError("hosmer_lemeshow: g must be in [3, 1000]")
    if not order_cols:
        raise ValueError(
            "hosmer_lemeshow: order_cols must name tie-breaking "
            "columns — a total order is the determinism contract"
        )
    dec = f"decimal(12,{scale})"
    flt = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *by,
        *order_cols,
        F.col(prob_col).cast(dec).alias("_p"),
        F.col(label_col).cast("int").alias("_y"),
    )
    if validation_enabled():
        n_bad = flt.filter(
            (F.col("_p") < 0) | (F.col("_p") > 1) | ~F.col("_y").isin([0, 1])
        ).count()
        if n_bad:
            raise ValueError(
                f"hosmer_lemeshow: {n_bad} row(s) with probability outside "
                "[0,1] or non-binary label — fix the score pipeline"
            )
    w_ord = Window.partitionBy(*by).orderBy("_p", *order_cols)
    w_all = Window.partitionBy(*by)
    binned = flt.select(
        *by,
        "_p",
        "_y",
        (
            (F.row_number().over(w_ord) - F.lit(1)).cast("long")
            * F.lit(g)
        ).alias("_rg"),
        F.count(F.lit(1)).over(w_all).alias("_cnt"),
    ).select(
        *by,
        "_p",
        "_y",
        F.expr("_rg div _cnt").alias("_bin"),
    )
    per = binned.groupBy(*by, "_bin").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum("_y").alias("_o1"),
        F.sum("_p").alias("_e1"),
    )
    arr = per.groupBy(*by).agg(
        F.sum("_nb").alias("n"),
        F.count(F.lit(1)).alias("g_bins"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_bin").alias("b"),
                    F.col("_nb").cast("double").alias("nbd"),
                    F.col("_o1").cast("double").alias("o1d"),
                    F.col("_e1").cast("double").alias("e1d"),
                )
            )
        ).alias("_lv"),
    )
    ok = (F.col("g_bins") >= 3) & F.forall(
        F.col("_lv"),
        lambda v: (v["e1d"] > F.lit(0.0)) & (v["e1d"] < v["nbd"]),
    )
    hl = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["o1d"] - v["e1d"])
        * (v["o1d"] - v["e1d"])
        / (v["e1d"] * (F.lit(1.0) - v["e1d"] / v["nbd"])),
    )
    return arr.select(
        *by,
        "n",
        "g_bins",
        F.when(ok, hl).alias("hl_stat"),
        F.when(ok, (F.col("g_bins") - F.lit(2)).cast("long")).alias("df"),
    )


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    scale: int = 2,
) -> DataFrame:
    """Murphy decomposition of the Brier score (L424): one row ``(n,
    n_bins, base_rate, reliability, resolution, uncertainty,
    brier)`` — WHY is the Brier score what it is (L166 reports the
    score and the reliability table; Murphy 1973 splits the score
    into its causes):

        REL = (1/N)·Σ_k n_k·(p_k − ō_k)²   (miscalibration — bad)
        RES = (1/N)·Σ_k n_k·(ō_k − ō)²     (discrimination — good)
        UNC = ō·(1 − ō)                     (irreducible)
        Brier = REL − RES + UNC             (the identity, emitted
                                             from the decomposition
                                             and pinned against the
                                             L166 direct score by
                                             test)

    The bin grid IS the probability's contract quantization
    (DECIMAL(12, scale) — the L166 convention), so p_k is exact, the
    per-bin counts n_k and Σy are exact integers, and the only IEEE
    work is the per-bin fixed trees folded over the BOUNDED sorted
    bin list (≤ 10^scale + 1 bins — the L140 float discipline).
    Out-of-range probabilities / non-binary labels REFUSED (the
    calibration-family rule); empty input → empty frame.

    No reference counterpart; calibration analytics per SURVEY §2.11.
    """
    base = _prepared(df, prob_col, label_col, scale)
    bins = base.groupBy("_p").agg(
        F.count(F.lit(1)).alias("_nk"),
        F.sum("_y").alias("_sy"),
    )
    agg = bins.agg(
        F.sum("_nk").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("_sy").alias("_ny"),
        F.sort_array(
            F.collect_list(F.struct("_p", "_nk", "_sy"))
        ).alias("_lv"),
    )
    nd = F.col("n").cast("double")
    obar = F.col("_ny").cast("double") / nd
    rel = (
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a, b: a
            + b["_nk"].cast("double")
            * (
                b["_p"].cast("double")
                - b["_sy"].cast("double") / b["_nk"].cast("double")
            )
            * (
                b["_p"].cast("double")
                - b["_sy"].cast("double") / b["_nk"].cast("double")
            ),
        )
        / nd
    )
    res = (
        F.aggregate(
            F.col("_lv"),
            F.lit(0.0),
            lambda a, b: a
            + b["_nk"].cast("double")
            * (b["_sy"].cast("double") / b["_nk"].cast("double") - obar)
            * (b["_sy"].cast("double") / b["_nk"].cast("double") - obar),
        )
        / nd
    )
    unc = obar * (F.lit(1.0) - obar)
    ok = F.col("n") > 0
    return agg.select(
        "n",
        "n_bins",
        F.when(ok, obar).alias("base_rate"),
        F.when(ok, rel).alias("reliability"),
        F.when(ok, res).alias("resolution"),
        F.when(ok, unc).alias("uncertainty"),
        F.when(ok, rel - res + unc).alias("brier"),
    )


def temperature_grid(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    temperatures: list[str],
    scale: int = 4,
) -> DataFrame:
    """Temperature-scaling grid selection (L427): one row per
    candidate ``(temperature, n, nll, is_best)`` — the post-hoc
    calibration knob (Guo et al. 2017) fitted the engine's way: NO
    iterative optimizer, a PINNED grid of candidate temperatures
    scored exactly and an argmin the driver can value-check:

        p_T = σ(logit(p)/T)         per row, a fixed IEEE tree
        NLL(T) = −Σ [y·ln p_T + (1−y)·ln(1−p_T)]

    Per-row log-likelihood terms are quantized half-up onto the 1e-9
    grid and summed as EXACT decimals per temperature (the L390
    discipline), so the argmin comparison runs on exact decimal
    sums — ``is_best`` cannot knife-edge across engines (ties break
    to the SMALLEST temperature, pinned).  Temperatures are decimal
    STRINGS (≤ 32, positive, distinct); probabilities in {0, 1}
    exactly are REFUSED (infinite logit — a saturated upstream score
    pipeline is a bug this operator must not paper over).

    Scale shape: one narrow projection + ONE combinable aggregation
    computing every temperature's sum in a single scan.

    No reference counterpart; calibration analytics per SURVEY §2.11
    (composes with isotonic L196, ECE L203, Murphy L424)."""
    from decimal import Decimal

    if not temperatures:
        raise ValueError(
            "temperature_grid: temperatures must be non-empty"
        )
    if len(temperatures) > 32:
        raise ValueError("temperature_grid: more than 32 candidates")
    decs = [Decimal(t) for t in temperatures]
    if len(set(decs)) != len(decs):
        raise ValueError("temperature_grid: duplicate temperatures")
    if any(t <= 0 for t in decs):
        raise ValueError("temperature_grid: temperatures must be > 0")
    base = _prepared(df, prob_col, label_col, scale)
    if validation_enabled():
        n_sat = base.filter(
            (F.col("_p") <= 0) | (F.col("_p") >= 1)
        ).count()
        if n_sat:
            raise ValueError(
                f"temperature_grid: {n_sat} saturated probability(ies) "
                "(exactly 0 or 1) — logit is infinite; fix the score "
                "pipeline"
            )
    pd_ = F.col("_p").cast("double")
    logit = F.log(pd_ / (F.lit(1.0) - pd_))
    y = F.col("_y").cast("double")
    dec = "decimal(38,0)"
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(dec)  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, t in enumerate(decs):
        z = logit / F.lit(float(t))
        pt = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        ll = y * F.log(pt) + (F.lit(1.0) - y) * F.log(
            F.lit(1.0) - pt
        )
        aggs.append(F.sum(q(ll)).alias(f"_q{i}"))
    agg = base.agg(*aggs)
    best = None
    for i in range(len(decs)):
        c = F.col(f"_q{i}")
        best = c if best is None else F.greatest(best, c)
    # ties break to the SMALLEST temperature: only the first (in
    # ascending-temperature order) index achieving the max is best
    order = sorted(range(len(decs)), key=lambda i: decs[i])
    rows = []
    for rank, i in enumerate(order):
        flag = F.col(f"_q{i}") == best
        for j in order[:rank]:
            flag = flag & (F.col(f"_q{j}") != best)
        rows.append(
            F.struct(
                F.lit(str(decs[i])).alias("temperature"),
                F.col(f"_q{i}").alias("_qs"),
                flag.alias("_best_flag"),
            )
        )
    ex = agg.select("n", F.explode(F.array(*rows)).alias("_r"))
    return ex.select(
        F.col("_r")["temperature"].alias("temperature"),
        "n",
        (
            -(F.col("_r")["_qs"].cast("double") / F.lit(1e9))
        ).alias("nll"),
        F.col("_r")["_best_flag"].alias("is_best"),
    )


def spiegelhalter_z(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    scale: int = 4,
) -> DataFrame:
    """Spiegelhalter's Z calibration test (L428): one row ``(n, z)``
    — the hypothesis TEST the calibration family lacked (L166/L203/
    L424 measure miscalibration; Spiegelhalter 1986 tests it, used
    across clinical-model validation):

        Z = Σ (y−p)(1−2p) / √( Σ (1−2p)²·p·(1−p) )

    With probabilities contract-quantized to DECIMAL(12, scale) (the
    L166 convention) EVERY term is exact decimal arithmetic — both
    sums are order-free exact decimals and Z is one division and one
    sqrt: bit-identical, UNGRIDDED, no fold bounds, nothing
    collected.  A degenerate denominator (all p ∈ {0, 1}ish mass —
    zero variance) → NULL.  Out-of-range p / non-binary y refused
    (the calibration-family rule).

    No reference counterpart; calibration analytics per SURVEY §2.11.
    """
    base = _prepared(df, prob_col, label_col, scale)
    # NARROW containers: decimal products widen by summed scales, so
    # starting narrow keeps every product's full true scale within
    # precision 38 (a wide starting cast would force scale rounding)
    p = F.col("_p").cast(f"decimal(6,{scale})")
    yv = F.col("_y").cast("decimal(2,0)")
    one = F.lit(1).cast("decimal(2,0)")
    two = F.lit(2).cast("decimal(2,0)")
    num_t = (yv - p) * (one - two * p)
    den_t = (one - two * p) * (one - two * p) * p * (one - p)
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(num_t).alias("_num"),
        F.sum(den_t).alias("_den"),
    )
    return agg.select(
        "n",
        F.when(
            F.col("_den") > 0,
            F.col("_num").cast("double")
            / F.sqrt(F.col("_den").cast("double")),
        ).alias("z"),
    )
