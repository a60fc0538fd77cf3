"""Information-theoretic dependence/divergence (L152/L153): mutual
information between two categoricals (the feature-selection ranking
statistic) and the Jensen-Shannon divergence between two samples of a
categorical (the bounded, symmetric drift distance that — unlike KL —
is finite when a category is missing on one side).  Same cross-engine
discipline as χ² (L140): all counts are EXACT integers, each term is
a fixed IEEE tree, and the bounded cell/category sum runs as a
0.0-prepended left-associative fold over the SORTED keys — addend
order pinned, remaining cross-engine delta is libm-ulp in ``ln``.

L152 — MI (nats) with marginal entropies and the sqrt-normalized NMI:

    MI  = Σ_cells (o/N)·ln(o·N/(rt·ct))       (o>0 cells only)
    H(X) = −Σ_rows (rt/N)·ln(rt/N),  NMI = MI/√(H(X)·H(Y))

NMI is NULL when either marginal entropy is zero (a constant column
carries no information to normalize by).

L153 — JSD (nats) between samples a/b over the category union:

    JSD = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q))

with p = cnt_a/n_a, q = cnt_b/n_b; zero-count terms contribute 0 (the
x·ln x → 0 limit), so missing categories are handled exactly.  Bounded
by ln 2; 0 ⇔ identical distributions.

Scale shape: one combinable groupBy over the fact table per operator;
margins are tiny broadcast joins; the fold runs over the BOUNDED
distinct-category/cell list (thousands at worst).  A 100 TB table is
scanned once; nothing is quadratic or collected beyond the bounded
cell list.

No reference counterpart; feature-selection/drift analytics per
SURVEY §2.11 (composes with L131 PSI and L147 KS for drift on
categoricals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold(struct_cols: list, term: Column) -> Column:
    """0.0-prepended left-assoc fold over key-sorted structs."""
    return F.aggregate(
        F.sort_array(F.collect_list(F.struct(*struct_cols, term.alias("_t")))),
        F.lit(0.0),
        lambda acc, v: acc + v["_t"],
    )


def mutual_information(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row ``(n, mi, h_x, h_y, nmi)`` — MI in nats between two
    categorical columns (NULL categories excluded), plus marginal
    entropies and sqrt-normalized NMI (NULL if either entropy is 0)."""
    flt = df.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    cells = flt.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    nd = F.col("n").cast("double")
    mi_term = (
        F.col("o").cast("double")
        / nd
        * F.log(
            F.col("o").cast("double")
            * nd
            / (F.col("rt") * F.col("ct")).cast("double")
        )
    )
    mi = (
        cells.join(F.broadcast(rows), "x")
        .join(F.broadcast(cols), "y")
        .crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(_fold([F.col("x"), F.col("y")], mi_term).alias("mi"))
    )
    h_term_x = -(
        F.col("rt").cast("double") / nd * F.log(F.col("rt").cast("double") / nd)
    )
    hx = (
        rows.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(_fold([F.col("x")], h_term_x).alias("h_x"))
    )
    h_term_y = -(
        F.col("ct").cast("double") / nd * F.log(F.col("ct").cast("double") / nd)
    )
    hy = (
        cols.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(_fold([F.col("y")], h_term_y).alias("h_y"))
    )
    out = mi.join(hx, "n").join(hy, "n")
    ok = (F.col("h_x") > 0.0) & (F.col("h_y") > 0.0)
    return out.select(
        "n",
        "mi",
        "h_x",
        "h_y",
        F.when(ok, F.col("mi") / F.sqrt(F.col("h_x") * F.col("h_y"))).alias(
            "nmi"
        ),
    )


def js_divergence(
    df: DataFrame,
    sample_col: str,
    sample_a: str,
    sample_b: str,
    category_col: str,
) -> DataFrame:
    """One row ``(n_a, n_b, jsd)`` — Jensen-Shannon divergence (nats)
    between the category distributions of two named samples; rows of
    other samples are ignored; either sample empty → NULL jsd."""
    flt = df.filter(
        F.col(category_col).isNotNull()
        & F.col(sample_col).isin([sample_a, sample_b])
    )
    is_a = (F.col(sample_col) == sample_a).cast("long")
    cats = flt.groupBy(F.col(category_col).alias("cat")).agg(
        F.sum(is_a).alias("ca"), F.sum(F.lit(1) - is_a).alias("cb")
    )
    tot = cats.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    # NULL-safe denominators: ANSI mode raises on x/0 even for
    # doubles; an empty sample must flow to NULL jsd instead
    na_d = F.when(F.col("n_a") > 0, F.col("n_a").cast("double"))
    nb_d = F.when(F.col("n_b") > 0, F.col("n_b").cast("double"))
    p = F.col("ca").cast("double") / na_d
    q = F.col("cb").cast("double") / nb_d
    # x·ln(2x/(x+y)) with the x→0 limit pinned to exactly 0
    term = F.when(F.col("ca") > 0, p * F.log(p + p) - p * F.log(p + q)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cb") > 0, q * F.log(q + q) - q * F.log(p + q)).otherwise(
        F.lit(0.0)
    )
    agg = (
        cats.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(_fold([F.col("cat")], term).alias("_s"))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        "n_a",
        "n_b",
        F.when(ok, F.col("_s") / F.lit(2.0)).alias("jsd"),
    )


def v_measure(
    df: DataFrame,
    label_col: str,
    cluster_col: str,
) -> DataFrame:
    """One row ``(n, mi, h_label, h_cluster, homogeneity,
    completeness, v_measure)`` — the entropy-based clustering-vs-truth
    scorecard (L227; Rosenberg & Hirschberg 2007), composed directly
    on the L152 mutual-information machinery:

        homogeneity  = MI / H(label)     (1.0 when H(label) = 0)
        completeness = MI / H(cluster)   (1.0 when H(cluster) = 0)
        v = 2·h·c / (h + c)              (0.0 when h + c = 0)

    homogeneity says "each cluster holds one class"; completeness
    says "each class lands in one cluster"; V is their harmonic mean —
    the ARI-complementing diagnostic (L157 counts pairs, V measures
    information).  Each statistic is ONE division over the L152 folds
    (MI and both entropies are 0.0-prepended sorted-cell folds of
    exact-count terms), so the whole panel inherits L152's
    bit-identity.  NULL categories are excluded (the L152 contract).

    Scale shape: identical to L152 — one contingency groupBy + bounded
    margin folds; 100 TB scans once.

    No reference counterpart; clustering-evaluation analytics per
    SURVEY §2.11.
    """
    base = mutual_information(df, label_col, cluster_col)
    h = F.when(F.col("h_x") > 0.0, F.col("mi") / F.col("h_x")).otherwise(
        F.lit(1.0)
    )
    c = F.when(F.col("h_y") > 0.0, F.col("mi") / F.col("h_y")).otherwise(
        F.lit(1.0)
    )
    staged = base.select(
        "n",
        "mi",
        F.col("h_x").alias("h_label"),
        F.col("h_y").alias("h_cluster"),
        h.alias("homogeneity"),
        c.alias("completeness"),
    )
    hc = F.col("homogeneity") + F.col("completeness")
    v = (F.lit(2.0) * F.col("homogeneity") * F.col("completeness")) / hc
    return staged.select(
        "*", F.when(hc > 0.0, v).otherwise(F.lit(0.0)).alias("v_measure")
    )


def hellinger_distance(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """``(by..., n_a, n_b, bc, hellinger, bhattacharyya)`` — the
    Hellinger distance and Bhattacharyya coefficient/distance between
    two categorical distributions (L248): the bounded, symmetric
    members completing the divergence family (PSI L131 explodes on
    empty bins, JSD L153 is information-flavored, W₁ L181 needs an
    ordered domain; Hellinger is a true METRIC on distributions and
    lives in [0, 1]):

        BC = Σ_v sqrt((a_v/N_a)·(b_v/N_b))
        H  = sqrt(max(0, 1 − BC)),   D_B = −ln(BC)

    Cell counts are exact integers; each term is a fixed IEEE tree
    (two exactly-rounded divisions, one multiply, one sqrt) folded
    over the BOUNDED sorted value list (the L140 discipline); the
    max(0, ·) clamp absorbs the one-ulp negative BC−1 can produce
    when the distributions are identical.  BC = 0 (disjoint supports)
    → NULL bhattacharyya (H is exactly 1).  An empty side → all NULL.

    Scale shape: one (keys, value, group) groupBy + bounded folds —
    one scan of 100 TB.

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
        ).alias("_a"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_b"),
    )
    agg = vals.groupBy(*by).agg(
        F.sum("_a").alias("n_a"),
        F.sum("_b").alias("n_b"),
        F.sort_array(
            F.collect_list(F.struct("_v", "_a", "_b"))
        ).alias("_lv"),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    bc = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + F.sqrt(
            (v["_a"].cast("double") / nad)
            * (v["_b"].cast("double") / nbd)
        ),
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    h = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc))
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(ok, bc).alias("bc"),
        F.when(ok, h).alias("hellinger"),
        F.when(ok & (bc > 0.0), -F.log(bc)).alias("bhattacharyya"),
    )


def gk_lambda(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """One row ``(n, lambda_yx, lambda_xy)`` — Goodman-Kruskal λ
    (L259): the proportional-reduction-in-error association for
    categoricals — "how much better do I guess y knowing x than
    guessing the modal y blind":

        λ_y|x = (Σ_x max_y n_xy − max_y n_y) / (N − max_y n_y)

    (and symmetrically for λ_x|y).  Every quantity is an exact
    integer (cell maxima, margin maxima, one subtraction) and λ is
    ONE division — bit-identical, no folds, no transcendentals, the
    plainest member of the association family (χ² L140, V L194,
    MI L152, U L260).  A modal margin equal to N (constant column) →
    NULL for that direction.

    Scale shape: one combinable cell groupBy + two margin aggs —
    one scan of 100 TB.

    No reference counterpart; association analytics per SURVEY §2.11.
    """
    flt = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cells = flt.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_o"))
    mx_given_x = cells.groupBy("_x").agg(F.max("_o").alias("_m")).agg(
        F.sum("_m").alias("_sum_max_y")
    )
    mx_given_y = cells.groupBy("_y").agg(F.max("_o").alias("_m")).agg(
        F.sum("_m").alias("_sum_max_x")
    )
    marg_y = cells.groupBy("_y").agg(F.sum("_o").alias("_t")).agg(
        F.max("_t").alias("_max_y"), F.sum("_t").alias("n")
    )
    marg_x = cells.groupBy("_x").agg(F.sum("_o").alias("_t")).agg(
        F.max("_t").alias("_max_x")
    )
    j = (
        marg_y.crossJoin(F.broadcast(marg_x))
        .crossJoin(F.broadcast(mx_given_x))
        .crossJoin(F.broadcast(mx_given_y))
    )
    lam_yx = (F.col("_sum_max_y") - F.col("_max_y")).cast("double") / (
        F.col("n") - F.col("_max_y")
    ).cast("double")
    lam_xy = (F.col("_sum_max_x") - F.col("_max_x")).cast("double") / (
        F.col("n") - F.col("_max_x")
    ).cast("double")
    return j.select(
        "n",
        F.when(F.col("n") > F.col("_max_y"), lam_yx).alias("lambda_yx"),
        F.when(F.col("n") > F.col("_max_x"), lam_xy).alias("lambda_xy"),
    )


def theils_u(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """One row ``(n, mi, h_x, h_y, u_yx, u_xy)`` — Theil's uncertainty
    coefficient (L260): the ASYMMETRIC normalized mutual information —
    U(y|x) = MI/H(y) is the fraction of y's entropy explained by x
    (feature-screening's directional companion to the symmetric NMI,
    L152; identical machinery, one extra division each way).  H = 0 on
    a side → NULL for the direction normalized by it.

    Scale shape: exactly L152's.

    No reference counterpart; association analytics per SURVEY §2.11.
    """
    base = mutual_information(df, x_col, y_col)
    return base.select(
        "n",
        "mi",
        "h_x",
        "h_y",
        F.when(F.col("h_y") > 0.0, F.col("mi") / F.col("h_y")).alias(
            "u_yx"
        ),
        F.when(F.col("h_x") > 0.0, F.col("mi") / F.col("h_x")).alias(
            "u_xy"
        ),
    )


def overlap_panel(
    df: DataFrame,
    by: list[str],
    group_col: str,
    sample_a: str,
    sample_b: str,
    value_col: str,
) -> DataFrame:
    """Categorical overlap panel (L398): ``(by..., n_a, n_b, tv,
    intersection, bray_curtis)`` — the EXACT-arithmetic members
    completing the two-sample divergence family (PSI L131 and JSD
    L153 need logs, Hellinger L248 needs square roots — their sums
    ride bounded folds; these three are pure integer identities):

        TV           = Σ_v |a_v·N_b − b_v·N_a| / (2·N_a·N_b)
        intersection = Σ_v min(a_v·N_b, b_v·N_a) / (N_a·N_b)
        Bray-Curtis  = (N_a + N_b − 2·Σ_v min(a_v, b_v)) / (N_a + N_b)

    Every numerator term is an exact DECIMAL integer on the common
    denominator, so each statistic is ONE IEEE division —
    bit-identical, ungridded, and (unlike the L248 fold) the cell sum
    is ORDER-FREE and map-side combinable: no bounded-category
    contract, the value domain can be billions of cells.  The
    identity intersection = 1 − TV (probability vectors) is pinned by
    test, both conventions emitted because both are quoted in
    practice (drift dashboards vs histogram-matching literature);
    Bray-Curtis is the ecology/composition standard on RAW counts
    (size-sensitive — documented difference from the normalized two).
    Empty side → NULL tv/intersection; both empty → NULL all.

    Scale shape: one (keys, value, group) cell groupBy, one tiny
    totals agg joined back by key, one combinable agg — two keyed
    exchanges, no window, no collect.

    No reference counterpart; drift analytics per SURVEY §2.11."""
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
        ).alias("_a"),
        F.sum(
            F.when(F.col("_g") == sample_b, F.col("_c")).otherwise(0)
        ).alias("_b"),
    )
    totals = vals.groupBy(*by).agg(
        F.sum("_a").alias("n_a"), F.sum("_b").alias("n_b")
    )
    joined = (
        vals.join(totals, list(by))
        if by
        else vals.crossJoin(F.broadcast(totals))
    )
    dec = "decimal(19,0)"
    a, b = F.col("_a").cast(dec), F.col("_b").cast(dec)
    na, nb = F.col("n_a").cast(dec), F.col("n_b").cast(dec)
    agg = joined.groupBy(*by, "n_a", "n_b").agg(
        F.sum(F.abs(a * nb - b * na)).alias("_tvn"),
        F.sum(F.least(a * nb, b * na)).alias("_inn"),
        F.sum(F.least(F.col("_a"), F.col("_b"))).alias("_minn"),
    )
    na2, nb2 = F.col("n_a").cast(dec), F.col("n_b").cast(dec)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    some = (F.col("n_a") + F.col("n_b")) > 0
    return agg.select(
        *by,
        "n_a",
        "n_b",
        F.when(
            ok,
            F.col("_tvn").cast("double")
            / (F.lit(2).cast(dec) * na2 * nb2).cast("double"),
        ).alias("tv"),
        F.when(
            ok,
            F.col("_inn").cast("double") / (na2 * nb2).cast("double"),
        ).alias("intersection"),
        F.when(
            some,
            (
                F.col("n_a") + F.col("n_b")
                - F.lit(2) * F.col("_minn")
            ).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double"),
        ).alias("bray_curtis"),
    )
