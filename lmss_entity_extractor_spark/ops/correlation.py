"""Correlation analysis (L141/L142): Pearson correlation matrix over a
set of numeric columns and Spearman rank correlation — the standard
"which features move together" profile, re-expressed for cross-engine
bit-identity.

L141 — Pearson matrix: for every unordered column pair {x, y},

    corr = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))

from EXACT DECIMAL sufficient statistics (the L135 discipline) through
one fixed IEEE tree (sqrt exactly rounded ⇒ bit-identical, NO grid).
All p·(p+1)/2 pairs come out of ONE combinable aggregation over the
table — a 100 TB table is scanned once regardless of how many columns
are profiled.  Zero-variance columns yield NULL correlations.
Rows with a NULL in ANY profiled column are excluded (listwise
deletion — the convention that keeps every pair on the same n and the
matrix positive semi-definite).

L142 — Spearman: Pearson applied to fractional ranks (average-rank
ties), expressed as DOUBLED ranks (rank_min + rank_max — always an
exact integer, no .5 concerns), so the same decimal-exact Pearson
machinery applies.  The doubling cancels EXACTLY: the factor 4 scales
the numerator and each variance by an exact power of two, and IEEE
multiplication-by-4 / sqrt both commute with that scaling — so
corr(2u, 2v) is bit-identical to corr(u, v).  Ranking is NOT a global
row sort: ranks depend only on values, so each column ranks through
its value-count table (combinable groupBy + window over DISTINCT
values + join back) — the only ordered pass is over the bounded
distinct-value table, never the 100 TB of rows.

No reference counterpart; profiling analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def _pearson_from_decimal(stats_row_df: DataFrame, pairs) -> DataFrame:
    """Long-form (col_a, col_b, n, corr) from a 1-row sufficient-stat
    frame with columns n, s_<c>, ss_<c>_<c'> for every needed pair."""
    out = []
    for a, b in pairs:
        n = F.col("n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxx = F.col(f"ss_{a}_{a}").cast("double")
        syy = F.col(f"ss_{b}_{b}").cast("double")
        sxy = F.col(f"ss_{a}_{b}").cast("double")
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = F.when(
            (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
            (n * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary)),
        )
        out.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                corr.alias("corr"),
            )
        )
    return stats_row_df.select(
        F.explode(F.array(*out)).alias("p")
    ).select("p.col_a", "p.col_b", "p.n", "p.corr")


def corr_matrix(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """``(col_a, col_b, n, corr)`` — Pearson correlation for every
    unordered pair (col_a < col_b lexicographically).  Columns must be
    exactly representable at ``DECIMAL(18, scale)``."""
    if len(columns) < 2:
        raise ValueError(f"need >= 2 columns, got {columns}")
    dec = f"decimal(18,{scale})"
    cond = None
    for c in columns:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    vals = df.filter(cond)
    cols = sorted(columns)
    aggs = [F.count(F.lit(1)).alias("n")]
    pairs = []
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a).cast(dec)).alias(f"s_{a}"))
        aggs.append(
            F.sum(F.col(a).cast(dec) * F.col(a).cast(dec)).alias(
                f"ss_{a}_{a}"
            )
        )
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(
                    f"ss_{a}_{b}"
                )
            )
            pairs.append((a, b))
    return _pearson_from_decimal(vals.agg(*aggs), pairs)


def doubled_ranks(df: DataFrame, columns: list[str]) -> DataFrame:
    """``df`` with ``rk2_<c>`` = 2× the fractional (average-tie) rank
    of each column — 2·avg_rank = rank_min + rank_max = exact integer,
    so the Spearman input is integer-valued (decimal-exact at scale 0).

    NOT a global row sort: a rank depends only on the VALUE, so each
    column ranks via its value-count table (one combinable groupBy),
    a window over the DISTINCT values (orders of magnitude smaller
    than the rows), and an equi-join back — with rank_min = cum − cnt
    + 1, rk2 = 2·cum − cnt + 1.  Rows with any NULL are excluded
    first (listwise, matching :func:`corr_matrix`)."""
    cond = None
    for c in columns:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond & k)
    out = df.filter(cond)
    for c in columns:
        counts = out.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked_vals = counts.select(
            "_v",
            (2 * F.sum("_cnt").over(w) - F.col("_cnt") + 1)
            .cast("long")
            .alias(f"rk2_{c}"),
        )
        out = out.join(ranked_vals, out[c] == ranked_vals["_v"]).drop("_v")
    return out


def spearman_corr(
    df: DataFrame,
    columns: list[str],
) -> DataFrame:
    """``(col_a, col_b, n, corr)`` — Spearman rank correlation for
    every unordered pair, exact under ties (average-rank method via
    doubled integer ranks; the doubling cancels in the statistic)."""
    ranked = doubled_ranks(df, columns)
    rcols = [f"rk2_{c}" for c in sorted(columns)]
    out = corr_matrix(ranked, rcols, scale=0)
    strip = F.regexp_replace(F.col("col_a"), "^rk2_", "")
    strip_b = F.regexp_replace(F.col("col_b"), "^rk2_", "")
    return out.select(
        strip.alias("col_a"), strip_b.alias("col_b"), "n", "corr"
    )


def _pair_counts(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Shared concordant/discordant core for L199 τ-b and L226's
    ordinal panel: ``(by..., n, _conc, _disc, _n1, _n2, _r, _cc)``.

    Over the (distinct-x × distinct-y) grid, pair totals come from the
    2-D inclusive prefix P and the axis prefixes R (within-x) and
    C (within-y):

        S≺(cell) = P − R − C + c            (both strictly below)
        S⊀(cell) = Tx(<x) − (P − R)          (x below, y above)
        concordant = Σ c·S≺,  discordant = Σ c·S⊀

    — each unordered pair counted exactly once (at its higher-x cell),
    every term an exact DECIMAL(38,0) integer via TWO keyed windows
    (y-prefix within x, then x-prefix at fixed y); the tie terms
    n1 = Σ tx(tx−1)/2, n2 = Σ ty(ty−1)/2 and the level counts
    _r = #distinct x, _cc = #distinct y ride the same aggs.
    """
    dec = "decimal(38,0)"
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*by, F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    pts = base.groupBy(*by, "_x", "_y").agg(F.count(F.lit(1)).alias("_c"))
    dx = pts.select(*by, "_x").distinct()
    dy = pts.select(*by, "_y").distinct()
    grid = (
        (dx.join(dy, list(by)) if by else dx.crossJoin(dy))
        .join(pts, [*by, "_x", "_y"], "left")
        .select(
            *by, "_x", "_y", F.coalesce(F.col("_c"), F.lit(0)).alias("_c")
        )
    )
    w_incol = (
        Window.partitionBy(*by, "_x")
        .orderBy("_y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn("_r", F.sum("_c").over(w_incol))
    w_x = (
        Window.partitionBy(*by, "_y")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # P = inclusive 2-D prefix: x-prefix of the within-x y-prefixes
    grid = grid.withColumn("_p", F.sum("_r").over(w_x)).withColumn(
        "_cy", F.sum("_c").over(w_x)
    )
    # total rows of strictly-lower x rows: Tx(<x) via row totals
    rowtot = grid.groupBy(*by, "_x").agg(F.max("_r").alias("_tx"))
    w_tx = (
        Window.partitionBy(*by)
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rowtot = rowtot.withColumn(
        "_txb", F.coalesce(F.sum("_tx").over(w_tx), F.lit(0))
    ).select(*by, "_x", "_txb")
    grid = grid.join(rowtot, [*by, "_x"])
    cd_ = F.col("_c").cast(dec)
    s_conc = (
        F.col("_p") - F.col("_r") - F.col("_cy") + F.col("_c")
    ).cast(dec)
    s_disc = (F.col("_txb") - (F.col("_p") - F.col("_r"))).cast(dec)
    sums = grid.groupBy(*by).agg(
        F.sum("_c").alias("n"),
        F.sum(cd_ * s_conc).alias("_conc"),
        F.sum(cd_ * s_disc).alias("_disc"),
    )
    tx = pts.groupBy(*by, "_x").agg(F.sum("_c").alias("_t"))
    ty = pts.groupBy(*by, "_y").agg(F.sum("_c").alias("_t"))
    td = F.col("_t").cast(dec)
    n1 = tx.groupBy(*by).agg(
        (F.sum(td * (td - 1)) / 2).alias("_n1"),
        F.count(F.lit(1)).alias("_r"),
    )
    n2 = ty.groupBy(*by).agg(
        (F.sum(td * (td - 1)) / 2).alias("_n2"),
        F.count(F.lit(1)).alias("_cc"),
    )
    out = sums
    for other in (n1, n2):
        out = out.join(other, list(by)) if by else out.crossJoin(other)
    return out


def kendall_tau_b(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """``(by..., n, concordant, discordant, tau_b)`` — Kendall's τ-b
    rank correlation with the standard tie normalization (the
    pair-counting companion to Spearman: Spearman squares rank gaps,
    Kendall counts inversions — more robust to single wild ranks, and
    its pair counts are the same machinery as Mann-Kendall's S but
    against a second VARIABLE instead of time).

    Callers pre-bucket continuous values (the L174/L198 convention) so
    both axes have bounded distinct values; the shared pair-count core
    (:func:`_pair_counts`, also consumed by L226's
    :func:`ordinal_association`) computes exact DECIMAL(38,0)
    concordant/discordant totals and tie terms over the distinct-value
    grid.  With n0 = n(n-1)/2:

        tau_b = (concordant - discordant)
                / sqrt((n0 - n1) * (n0 - n2))

    — one fixed IEEE tree over exact integers, bit-identical.  A group
    where either axis is constant (n0 = n1 or n0 = n2) yields NULL.

    Scale shape: one combinable (keys, x, y) groupBy; the bounded grid
    is a broadcast cross join; two keyed windows; one final combinable
    agg.  100 TB scans once.
    """
    dec = "decimal(38,0)"
    out = _pair_counts(df, by, x_col, y_col)
    nd = F.col("n").cast(dec)
    n0 = nd * (nd - 1) / 2
    da = (n0 - F.col("_n1")).cast("double")
    db = (n0 - F.col("_n2")).cast("double")
    diff = (F.col("_conc") - F.col("_disc")).cast("double")
    ok = (da > 0) & (db > 0)
    return out.select(
        *by,
        "n",
        F.col("_conc").cast("double").alias("concordant"),
        F.col("_disc").cast("double").alias("discordant"),
        F.when(ok, diff / F.sqrt(da * db)).alias("tau_b"),
    )


def ordinal_association(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """``(by..., n, concordant, discordant, gamma, somers_d_yx,
    somers_d_xy, tau_c)`` — the full ordinal-association panel (L226)
    over the SAME exact pair counts as Kendall's τ-b (L199), each a
    different tie treatment of (C − D):

        gamma (Goodman-Kruskal) = (C − D) / (C + D)     ties ignored
        d_yx (Somers')  = (C − D) / (n0 − n1)   pairs untied on X
        d_xy            = (C − D) / (n0 − n2)   pairs untied on Y
        tau_c (Stuart)  = 2m(C − D) / (n²(m−1)) m = min(#x, #y) levels

    gamma answers "of the pairs that COULD agree, how many do";
    Somers' d is the asymmetric regression-flavored variant (predictor
    X → outcome Y and the reverse); tau_c corrects τ-b's rectangular-
    table ceiling.  All four are single divisions over exact
    DECIMAL(38,0) pair counts — fixed IEEE trees, bit-identical,
    ungridded.  Degenerate denominators (no discriminating pairs, a
    constant axis, m < 2) yield NULL for that statistic only.

    Scale shape: identical to L199 — the panel rides the same one-scan
    grid machinery (:func:`_pair_counts`).

    No reference counterpart; ordinal analytics per SURVEY §2.11.
    """
    dec = "decimal(38,0)"
    out = _pair_counts(df, by, x_col, y_col)
    nd = F.col("n").cast(dec)
    n0 = nd * (nd - 1) / 2
    da = (n0 - F.col("_n1")).cast("double")
    db = (n0 - F.col("_n2")).cast("double")
    diff = (F.col("_conc") - F.col("_disc")).cast("double")
    both = (F.col("_conc") + F.col("_disc")).cast("double")
    md = F.least(F.col("_r"), F.col("_cc")).cast("double")
    ndd = F.col("n").cast("double")
    return out.select(
        *by,
        "n",
        F.col("_conc").cast("double").alias("concordant"),
        F.col("_disc").cast("double").alias("discordant"),
        F.when(both > 0, diff / both).alias("gamma"),
        F.when(da > 0, diff / da).alias("somers_d_yx"),
        F.when(db > 0, diff / db).alias("somers_d_xy"),
        F.when(
            (md >= 2) & (F.col("n") > 0),
            (F.lit(2.0) * md * diff) / (ndd * ndd * (md - F.lit(1.0))),
        ).alias("tau_c"),
    )


def partial_correlation(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    z_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., n, r_xy, r_xz, r_yz, r_xy_given_z)`` — the partial
    correlation of x and y CONTROLLING for z (the one-confounder
    deconfounding check that the plain corr_matrix, L135, cannot
    answer — does the x↔y association survive holding z fixed):

        r_xy·z = (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)(1−r_yz²))

    Every pairwise r comes from the L135 exact-decimal sufficient
    statistics (n·Σab − Σa·Σb over n-scaled exact integers) so the
    whole statistic is one fixed IEEE tree — bit-identical,
    ungridded.  n < 2, a zero pairwise variance, or |r_xz| = 1 /
    |r_yz| = 1 (z fully determines a margin) yields NULL.

    Scale shape: ONE combinable groupBy computing all nine sums; 100
    TB scans once."""
    dec = f"decimal(18,{scale})"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    zd = F.col(z_col).cast(dec)
    agg = (
        df.filter(
            F.col(x_col).isNotNull()
            & F.col(y_col).isNotNull()
            & F.col(z_col).isNotNull()
        )
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("_sx"),
            F.sum(yd).alias("_sy"),
            F.sum(zd).alias("_sz"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(yd * yd).alias("_syy"),
            F.sum(zd * zd).alias("_szz"),
            F.sum(xd * yd).alias("_sxy"),
            F.sum(xd * zd).alias("_sxz"),
            F.sum(yd * zd).alias("_syz"),
        )
    )
    nd = F.col("n").cast("double")

    def _cov(sab, sa, sb):
        return nd * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")

    def _var(saa, sa):
        return nd * F.col(saa).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sa).cast("double")

    vx, vy, vz = _var("_sxx", "_sx"), _var("_syy", "_sy"), _var("_szz", "_sz")
    r_xy = _cov("_sxy", "_sx", "_sy") / F.sqrt(vx * vy)
    r_xz = _cov("_sxz", "_sx", "_sz") / F.sqrt(vx * vz)
    r_yz = _cov("_syz", "_sy", "_sz") / F.sqrt(vy * vz)
    denom = F.sqrt(
        (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    )
    ok_pair = (F.col("n") >= 2) & (vx > 0) & (vy > 0) & (vz > 0)
    ok_part = ok_pair & (denom > 0)
    return agg.select(
        *by,
        "n",
        F.when(ok_pair, r_xy).alias("r_xy"),
        F.when(ok_pair, r_xz).alias("r_xz"),
        F.when(ok_pair, r_yz).alias("r_yz"),
        F.when(ok_part, (r_xy - r_xz * r_yz) / denom).alias(
            "r_xy_given_z"
        ),
    )


def distance_correlation(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    max_len: int = 500,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, dcov2, dvar_x, dvar_y, dcor)`` — distance
    correlation (L301, Székely-Rizzo-Bakirov 2007): dependence of ANY
    form — dCor = 0 iff X and Y are INDEPENDENT, where Pearson (L141)
    sees only linear and Spearman (L142) only monotone association;
    the pairwise companion to mutual information (L152) that needs no
    binning:

        A = double-centred |xᵢ−xⱼ| matrix, B likewise for y
        V²(X,Y) = mean(A∘B),  R = sqrt(V²(X,Y)/sqrt(V²(X)·V²(Y)))

    The n×n distance matrices never materialize as tables: row means,
    grand means, and the three centred products are order-pinned
    nested folds INSIDE the packed per-group arrays (the L161
    ``max_len`` contract — the statistic is O(n²) by definition;
    sample first).  |differences| are exact decimals; tiny negative
    V² from float cancellation clamps to 0 (documented).  Zero
    distance variance on either margin → NULL dcor.

    Scale shape: one keyed collect (bounded) → in-array folds — one
    scan, one shuffle on the group keys.

    No reference counterpart; dependence analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    sizes = flt.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_len).count()
        if over:
            raise ValueError(
                f"distance_correlation: a group exceeds max_len={max_len}"
            )
    packed = flt.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(x_col).cast(dec).alias("x"),
                    F.col(y_col).cast(dec).alias("y"),
                )
            )
        ).alias("_a")
    )
    xs = F.transform(F.col("_a"), lambda s: s["x"])
    ys = F.transform(F.col("_a"), lambda s: s["y"])
    n = F.size(F.col("_a"))
    nd = n.cast("double")
    s0 = packed.select(
        *by, xs.alias("_xs"), ys.alias("_ys"), n.alias("n")
    )
    nloc = F.col("n")
    ndl = nloc.cast("double")

    def _row_means(arr):
        return F.transform(
            F.sequence(F.lit(1), nloc),
            lambda i: F.aggregate(
                F.col(arr),
                F.lit(0.0),
                lambda a, v: a
                + F.abs(F.element_at(F.col(arr), i) - v).cast(
                    "double"
                ),
            )
            / ndl,
        )
    s1 = s0.select(
        *by,
        "n",
        "_xs",
        "_ys",
        _row_means("_xs").alias("_ra"),
        _row_means("_ys").alias("_rb"),
    )
    ga = (
        F.aggregate(F.col("_ra"), F.lit(0.0), lambda a, v: a + v)
        / ndl
    )
    gb = (
        F.aggregate(F.col("_rb"), F.lit(0.0), lambda a, v: a + v)
        / ndl
    )
    s2 = s1.select(
        *by, "n", "_xs", "_ys", "_ra", "_rb",
        ga.alias("_ga"), gb.alias("_gb"),
    )

    def _cent(arr, rm, gm, i, j):
        return (
            F.abs(
                F.element_at(F.col(arr), i) - F.element_at(F.col(arr), j)
            ).cast("double")
            - F.element_at(F.col(rm), i)
            - F.element_at(F.col(rm), j)
            + F.col(gm)
        )

    def _vsum(f1, f2):
        return F.aggregate(
            F.sequence(F.lit(1), nloc),
            F.lit(0.0),
            lambda a, i: a
            + F.aggregate(
                F.sequence(F.lit(1), nloc),
                F.lit(0.0),
                lambda a2, j: a2 + f1(i, j) * f2(i, j),
            ),
        ) / (ndl * ndl)

    ca = lambda i, j: _cent("_xs", "_ra", "_ga", i, j)
    cb = lambda i, j: _cent("_ys", "_rb", "_gb", i, j)
    dcov2 = F.greatest(F.lit(0.0), _vsum(ca, cb))
    dvx = F.greatest(F.lit(0.0), _vsum(ca, ca))
    dvy = F.greatest(F.lit(0.0), _vsum(cb, cb))
    s3 = s2.select(
        *by, "n",
        dcov2.alias("dcov2"), dvx.alias("dvar_x"), dvy.alias("dvar_y"),
    )
    ok = (F.col("dvar_x") > 0.0) & (F.col("dvar_y") > 0.0)
    dcor = F.sqrt(
        F.col("dcov2")
        / F.sqrt(F.col("dvar_x") * F.col("dvar_y"))
    )
    return s3.select(
        *by, "n", "dcov2", "dvar_x", "dvar_y",
        F.when(ok, dcor).alias("dcor"),
    )


def winsorized_corr(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    trim_pct: int = 10,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, r_winsor)`` — winsorized Pearson correlation
    (L338): the robust-dependence middle ground — Pearson (L141) that
    a few outliers cannot buy, without discarding the metric scale
    the way ranks (L142) or ordinal patterns (L332) do:

        clamp each margin at its g-th / (n−g+1)-th order statistics
        (g = ⌊n·trim/100⌋, the L320 positional discipline), then
        Pearson on the clamped EXACT decimals

    Boundaries come from one ranked pass per margin (boundary ties
    value-deterministic), broadcast back (fit-small/apply-wide);
    clamped sums multiply at (18,s) — exact.  Zero clamped variance
    on either margin → NULL.

    Scale shape: two keyed window passes + one broadcast join + one
    combinable agg — three narrow scans.

    No reference counterpart; dependence analytics per SURVEY §2.11.
    """
    if not 0 < int(trim_pct) < 50:
        raise ValueError("winsorized_corr: trim_pct must be in 1..49")
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )

    def bounds(col, tag):
        w = Window.partitionBy(*by).orderBy(col)
        wa = Window.partitionBy(*by).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = flt.select(
            *by,
            F.col(col).cast(dec).alias("_v"),
            F.row_number().over(w).alias("_r"),
            F.count(F.lit(1)).over(wa).alias("_n"),
        )
        g = F.floor(
            F.col("_n") * F.lit(int(trim_pct)) / F.lit(100)
        )
        return ranked.groupBy(*by).agg(
            F.max(
                F.when(F.col("_r") == F.greatest(g, F.lit(1)), F.col("_v"))
            ).alias(f"_lo_{tag}"),
            F.max(
                F.when(
                    F.col("_r")
                    == F.least(F.col("_n") - g + 1, F.col("_n")),
                    F.col("_v"),
                )
            ).alias(f"_hi_{tag}"),
        )

    bx = bounds(x_col, "x")
    by_ = bounds(y_col, "y")
    bboth = bx.join(by_, by) if by else bx.crossJoin(by_)
    joined = (
        flt.join(F.broadcast(bboth), by)
        if by
        else flt.crossJoin(F.broadcast(bboth))
    )
    wx = F.least(
        F.greatest(F.col(x_col).cast(dec), F.col("_lo_x")),
        F.col("_hi_x"),
    )
    wy = F.least(
        F.greatest(F.col(y_col).cast(dec), F.col("_lo_y")),
        F.col("_hi_y"),
    )
    agg = joined.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(wx).alias("_sx"),
        F.sum(wy).alias("_sy"),
        F.sum(wx * wx).alias("_sxx"),
        F.sum(wy * wy).alias("_syy"),
        F.sum(wx * wy).alias("_sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = nd * sxy - sx * sy
    dx = nd * sxx - sx * sx
    dy = nd * syy - sy * sy
    ok = (F.col("n") >= 2) & (dx > 0.0) & (dy > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok, num / F.sqrt(dx * dy)).alias("r_winsor"),
    )
