"""Statistical process control charts (L325/L326): the individuals/
moving-range chart — control limits for a metric observed one value
at a time — and the EWMA control chart — the small-shift detector
whose limits widen with the warm-up.  Together with the attribute
p-chart (L324, `ops/sampling.py`) these are the three monitoring
charts an SLO/quality pipeline actually runs.

L325 — I-MR (Shewhart individuals): σ is estimated from the mean
moving range (d₂ = 1.128 for n = 2), so one outlier cannot inflate
its own limits the way a plain SD would:

    MR̄ = Σ|xₜ − xₜ₋₁|/(n−1),   UCL/LCL = x̄ ± 3·MR̄/1.128

plus the classic Western-Electric run rule: 8 consecutive points on
the same side of the centre line (a window sum of exact ±1 signs).
x̄ and MR̄ come from exact decimal sums and broadcast back
(fit-small/apply-wide); every flag is exact.

L326 — EWMA chart (Roberts 1959): zₜ = λxₜ + (1−λ)zₜ₋₁ from z₀ = x̄,
with time-varying limits

    x̄ ± 3·σ̂·sqrt(λ/(2−λ)·(1 − (1−λ)^{2t})),   σ̂ = MR̄/1.128

— detects sustained small shifts the I-chart misses.  The recurrence
is sequential, so the series packs (the L272 bounded discipline) and
the z-path is a LIST-APPENDING fold, exploded back to rows with the
per-t limit trees (pow is the libm reliance).

Scale shape: L325 = one combinable agg + broadcast join + one keyed
window pass.  L326 = one (keys) groupBy packing the bounded series +
one in-array fold.

No reference counterpart; monitoring analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_D2 = 1.128


def imr_chart(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., t, x, centre, ucl, lcl, beyond, run8)`` — the
    individuals chart rows; see module docstring."""
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"imr_chart: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    d38 = f"decimal(38,{scale})"
    xd = F.col(value_col).cast(dec).cast(d38)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    lagged = df.select(
        *by,
        F.row_number().over(wt).alias("t"),
        xd.alias("_x"),
        (xd - F.lag(xd, 1).over(wt)).alias("_d"),
    )
    stats = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum(F.abs(F.col("_d"))).alias("_mr"),
    )
    joined = (
        lagged.join(F.broadcast(stats), by)
        if by
        else lagged.crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    centre = F.col("_s").cast("double") / nd
    mrbar = F.col("_mr").cast("double") / (nd - F.lit(1.0))
    sigma = mrbar / F.lit(_D2)
    ucl = centre + F.lit(3.0) * sigma
    lcl = centre - F.lit(3.0) * sigma
    xdbl = F.col("_x").cast("double")
    sign = (
        F.when(xdbl > centre, F.lit(1))
        .when(xdbl < centre, F.lit(-1))
        .otherwise(F.lit(0))
    )
    staged = joined.select(
        *by,
        "t",
        xdbl.alias("x"),
        centre.alias("centre"),
        F.when(F.col("_n") >= 2, ucl).alias("ucl"),
        F.when(F.col("_n") >= 2, lcl).alias("lcl"),
        sign.alias("_sg"),
    )
    w8 = Window.partitionBy(*by).orderBy("t").rowsBetween(-7, 0)
    runsum = F.sum("_sg").over(w8)
    cnt8 = F.count(F.lit(1)).over(w8)
    return staged.select(
        *by,
        "t",
        "x",
        "centre",
        "ucl",
        "lcl",
        F.when(
            F.col("ucl").isNotNull(),
            (F.col("x") > F.col("ucl")) | (F.col("x") < F.col("lcl")),
        ).alias("beyond"),
        ((cnt8 == 8) & (F.abs(runsum) == 8)).alias("run8"),
    )


def ewma_chart(
    df: DataFrame,
    by: list[str],
    order_col: str,
    value_col: str,
    lam: float = 0.2,
    max_len: int = 100_000,
) -> DataFrame:
    """``(by..., t, x, z, centre, ucl, lcl, beyond)`` — the EWMA
    chart rows; see module docstring."""
    if not (0.0 < lam <= 1.0):
        raise ValueError("ewma_chart: need 0 < lam <= 1")
    from .trend import _packed

    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"ewma_chart: {n_null} NULL value(s) — impute first"
            )
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(f"ewma_chart: {dups} duplicate order key(s)")
    packed = _packed(df, by, order_col, value_col, max_len)
    xs = F.transform(F.col("_a"), lambda s: s["_x"])
    n = F.size(xs)
    nd = n.cast("double")
    centre = F.aggregate(xs, F.lit(0.0), lambda a, x: a + x) / nd
    mrbar = F.aggregate(
        F.sequence(F.lit(2), n),
        F.lit(0.0),
        lambda a, i: a
        + F.abs(
            F.element_at(xs, i) - F.element_at(xs, i - 1)
        ),
    ) / (nd - F.lit(1.0))
    s0 = packed.select(
        *by,
        xs.alias("_xs"),
        n.alias("_n"),
        centre.alias("centre"),
        (mrbar / F.lit(_D2)).alias("_sigma"),
    )
    ll = F.lit(float(lam))
    one = F.lit(1.0)
    zpath = F.aggregate(
        F.col("_xs"),
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                ll * x
                + (one - ll)
                * F.when(
                    F.size(acc) > 0,
                    F.element_at(acc, F.size(acc)),
                ).otherwise(F.col("centre"))
            ),
        ),
    )
    s1 = s0.select(
        *by,
        "_xs",
        "_n",
        "centre",
        "_sigma",
        zpath.alias("_zs"),
    )
    ex = s1.select(
        *by,
        "_n",
        "centre",
        "_sigma",
        F.posexplode(F.arrays_zip(F.col("_xs"), F.col("_zs"))).alias(
            "_i", "_e"
        ),
    )
    t = F.col("_i") + 1
    td = t.cast("double")
    width = (
        F.lit(3.0)
        * F.col("_sigma")
        * F.sqrt(
            ll
            / (F.lit(2.0) - ll)
            * (
                one
                - F.pow(one - ll, F.lit(2.0) * td)
            )
        )
    )
    z = F.col("_e")["_zs"]
    ok = F.col("_n") >= 2
    ucl = F.col("centre") + width
    lcl = F.col("centre") - width
    return ex.select(
        *by,
        t.alias("t"),
        F.col("_e")["_xs"].alias("x"),
        z.alias("z"),
        "centre",
        F.when(ok, ucl).alias("ucl"),
        F.when(ok, lcl).alias("lcl"),
        F.when(ok, (z > ucl) | (z < lcl)).alias("beyond"),
    )


def process_capability(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    value_col: str,
    lsl: float,
    usl: float,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, mean, sigma_within, sigma_overall, cp, cpk, pp,
    ppk)`` — process capability indices (L327): can the process FIT
    inside the spec limits — Cp/Cpk use the SHORT-TERM (within,
    moving-range) sigma, Pp/Ppk the overall sigma, and the gap
    between them is the drift the control charts (L324-L326) hunt:

        Cp  = (USL − LSL)/(6σ_w),  Cpk = min(USL − x̄, x̄ − LSL)/(3σ_w)
        σ_w = MR̄/1.128;   Pp/Ppk likewise with the sample SD

    Exact decimal sums for x̄/SD; MR̄ from one keyed window pass;
    every index is a fixed IEEE tree.  LSL ≥ USL refused; n < 2 or a
    zero sigma → NULL for its indices.

    Scale shape: one keyed window pass + one combinable agg.

    No reference counterpart; monitoring analytics per SURVEY §2.11.
    """
    if not lsl < usl:
        raise ValueError("process_capability: need lsl < usl")
    if validation_enabled():
        n_null = df.filter(F.col(value_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"process_capability: {n_null} NULL value(s)"
            )
    dec = f"decimal(18,{scale})"
    # products must multiply at (18,s): a (38,s) upcast makes Spark
    # cap the product scale below 2s and ROUND — no longer exact
    xd = F.col(value_col).cast(dec)
    wt = Window.partitionBy(*by).orderBy(
        *[F.col(c) for c in order_cols]
    )
    lagged = df.select(
        *by,
        xd.alias("_x"),
        (xd - F.lag(xd, 1).over(wt)).alias("_d"),
    )
    agg = lagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
        F.sum(F.abs(F.col("_d"))).alias("_mr"),
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    mean = sd_ / nd
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    sig_o = F.sqrt(var)
    sig_w = (
        F.col("_mr").cast("double") / (nd - F.lit(1.0)) / F.lit(_D2)
    )
    u = F.lit(float(usl))
    l_ = F.lit(float(lsl))
    span = u - l_

    def caps(sig):
        cp = span / (F.lit(6.0) * sig)
        cpk = F.least(u - mean, mean - l_) / (F.lit(3.0) * sig)
        return cp, cpk

    cp, cpk = caps(sig_w)
    pp, ppk = caps(sig_o)
    ok = F.col("n") >= 2
    ok_w = ok & (sig_w > 0.0)
    ok_o = ok & (sig_o > 0.0)
    return agg.select(
        *by,
        "n",
        mean.alias("mean"),
        F.when(ok_w, sig_w).alias("sigma_within"),
        F.when(ok_o, sig_o).alias("sigma_overall"),
        F.when(ok_w, cp).alias("cp"),
        F.when(ok_w, cpk).alias("cpk"),
        F.when(ok_o, pp).alias("pp"),
        F.when(ok_o, ppk).alias("ppk"),
    )


def robust_shape(
    df: DataFrame,
    by: list[str],
    value_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, q1, q2, q3, bowley, moors, qcv)`` — the robust
    (quantile-based) distribution-shape panel (L328): skewness and
    tail weight that a single outlier cannot move — the order-stat
    twins of the moment-based L266 panel:

        Bowley = (Q3 + Q1 − 2·Q2)/(Q3 − Q1)
        Moors  = ((E7 − E5) + (E3 − E1))/(Q3 − Q1)     (octiles)
        QCV    = (Q3 − Q1)/(Q3 + Q1)

    Octiles are exact DISCRETE order statistics at positions
    max(1, ⌊i·n/8⌋) — the L162 floored-index convention, tie-safe by
    value.  Zero IQR → NULL Bowley/Moors; Q3 + Q1 ≤ 0 → NULL QCV.

    Scale shape: one keyed window sort + one positional filter +
    conditional max pivots.

    No reference counterpart; robust-statistics analytics per SURVEY
    §2.11.
    """
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

    def pos(i):
        return F.greatest(
            F.lit(1), F.floor(F.col("_n") * F.lit(i) / F.lit(8))
        )

    agg = ranked.groupBy(*by).agg(
        F.max("_n").alias("n"),
        *[
            F.max(
                F.when(F.col("_r") == pos(i), F.col("_x"))
            ).alias(f"_e{i}")
            for i in range(1, 8)
        ],
    )
    e = {i: F.col(f"_e{i}").cast("double") for i in range(1, 8)}
    q1, q2, q3 = e[2], e[4], e[6]
    iqr = q3 - q1
    bowley = (q3 + q1 - F.lit(2.0) * q2) / iqr
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / iqr
    qcv = iqr / (q3 + q1)
    return agg.select(
        *by,
        "n",
        q1.alias("q1"),
        q2.alias("q2"),
        q3.alias("q3"),
        F.when(iqr > 0.0, bowley).alias("bowley"),
        F.when(iqr > 0.0, moors).alias("moors"),
        F.when(q3 + q1 > 0.0, qcv).alias("qcv"),
    )


def qn_sn_scale(
    df: DataFrame,
    by: list[str],
    value_col: str,
    max_len: int = 2000,
    scale: int = 4,
) -> DataFrame:
    """Qn/Sn robust scale (L410): ``(by..., n, sn, qn)`` — the
    Rousseeuw-Croux 1993 scale estimators completing the robust
    family (MAD needs a location and tops out at 37% Gaussian
    efficiency; Sn/Qn are location-FREE pairwise-difference scales
    with 50% breakdown and 58%/82% efficiency):

        Sn = 1.1926 · med_i ( med_{j≠i} |xᵢ − xⱼ| )
        Qn = 2.2219 · { |xᵢ − xⱼ| : i < j }₍ₖ₎,  k = C(h,2),
                                                  h = ⌊n/2⌋ + 1

    Absolute differences are EXACT decimals over the bounded in-row
    pair lattice (the L161/L225/L356 ``max_len`` contract — the
    statistics are pairwise by definition); every median uses the
    L162 pinned convention (floored-index order statistics, even
    counts averaged in DOUBLE), the Qn pick is one exact order
    statistic, and the consistency constants are pinned literals in
    the ASYMPTOTIC form (no finite-sample correction factors —
    documented; engines agree by construction).  n < 2 → NULL both.
    NULLs ignored.

    Scale shape: one keyed collect (bounded) → in-row lattice → two
    nested order-statistic picks; groups parallelize.

    No reference counterpart; robust analytics per SURVEY §2.11."""
    dec = f"decimal(18,{scale})"
    flt = df.filter(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).cast(dec).alias("_x")
    )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"qn_sn_scale: a group exceeds max_len={max_len} — the "
                "statistics are pairwise; sample first"
            )
    packed = flt.groupBy(*by).agg(
        F.sort_array(F.collect_list("_x")).alias("_a"),
        F.count(F.lit(1)).alias("n"),
    )
    e1 = packed.select(
        *by, "n", F.posexplode("_a").alias("_i", "_p")
    )
    e2 = e1.join(
        packed.select(*by, F.posexplode("_a").alias("_j", "_q")),
        list(by),
    )

    def _med(arr):
        k = F.size(arr)
        hi = F.element_at(arr, (F.floor(k / 2) + 1).cast("int"))
        lo = F.element_at(arr, F.floor((k + 1) / 2).cast("int"))
        return F.when(k % 2 == 1, hi).otherwise((lo + hi) / F.lit(2.0))

    diff = F.abs(F.col("_p") - F.col("_q")).cast("double")
    inner = (
        e2.filter(F.col("_i") != F.col("_j"))
        .groupBy(*by, "n", "_i")
        .agg(F.sort_array(F.collect_list(diff)).alias("_d"))
        .select(*by, "n", _med(F.col("_d")).alias("_mi"))
    )
    sn_df = inner.groupBy(*by, "n").agg(
        F.sort_array(F.collect_list("_mi")).alias("_ms")
    )
    qn_df = (
        e2.filter(F.col("_i") < F.col("_j"))
        .groupBy(*by, "n")
        .agg(F.sort_array(F.collect_list(diff)).alias("_ds"))
    )
    h = F.floor(F.col("n") / 2) + 1
    kq = (h * (h - 1) / 2).cast("int")
    joined = sn_df.join(qn_df, [*by, "n"], "full_outer")
    return joined.select(
        *by,
        "n",
        F.when(
            F.col("n") >= 2, F.lit(1.1926) * _med(F.col("_ms"))
        ).alias("sn"),
        F.when(
            F.col("n") >= 2,
            F.lit(2.2219) * F.element_at(F.col("_ds"), kq),
        ).alias("qn"),
    )
