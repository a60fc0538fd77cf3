"""Clustering evaluation (L156/L157): simplified silhouette (how well
does each point sit in its cluster) and the Adjusted Rand Index (how
well do two labelings agree) — the quality gates that close the L155
k-means / L6 near-dup-cluster loop.

L156 — simplified silhouette (Hruschka 2004; what sklearn calls the
"centroid" variant): against trained centroids only, never the O(n²)
pairwise matrix —

    a = ‖x − c_own‖,  b = min_{j≠own} ‖x − c_j‖,  s = (b − a)/max(a, b)

Each distance is one generated literal expression (√(x·x − 2·x·c +
‖c‖²) via the left-fold dot the assignment already uses; sqrt is
IEEE-exactly-rounded), so the whole evaluation is a narrow zero-
shuffle projection over 100 TB and every s is bit-stable given the
frozen centroids.  s is NULL when both distances are 0 (a point ON a
duplicated centroid — undefined by convention).

L157 — ARI (Hubert-Arabie 1985): over the contingency table of two
label columns, with all pair counts EXACT integers,

    ARI = (Σᵢⱼ C(nᵢⱼ,2) − E) / (½(Σᵢ C(aᵢ,2) + Σⱼ C(bⱼ,2)) − E),
    E = Σᵢ C(aᵢ,2)·Σⱼ C(bⱼ,2) / C(n,2)

Rescaled by 2·C(n,2) to clear the inner division: every accumulated
quantity becomes an exact DECIMAL(38,0) integer and ARI is ONE final
IEEE division — bit-identical, no grid.  Degenerate denominators
(both labelings trivial) → NULL; identical labelings → exactly 1.0.
The cross products bound n at ~10⁹ rows for DECIMAL(38,0); beyond
that ANSI mode fails LOUDLY (sample the labeling first — agreement
statistics stabilize long before 10⁹ pairs anyway).

Scale shape: silhouette is a projection; ARI is one combinable
groupBy per margin + the contingency groupBy — bounded outputs, one
scan of the fact table each.

No reference counterpart; clustering/evaluation analytics per
SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dlit, _dot_sql
from .validate import validation_enabled

_DEC = "decimal(38,0)"


def silhouette_simplified(
    df: DataFrame,
    centroids: list[tuple[int, list[float], float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Adds ``a`` (distance to own centroid), ``b`` (distance to the
    nearest other centroid) and ``silhouette`` columns.  ``centroids``
    is the `train_kmeans` output: ``[(cid, center, half_sqnorm)]``."""
    self_dot = (
        f"aggregate(zip_with(`{vec_col}`, `{vec_col}`, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, v) -> acc + v)"
    )
    dists = {
        cid: (
            f"sqrt(greatest(0D, (({self_dot} - "
            f"(2.0D * {_dot_sql(vec_col, cvec)})) + {_dlit(2.0 * h)})))"
        )
        for cid, cvec, h in centroids
    }
    a = "CASE " + " ".join(
        f"WHEN `{cluster_col}` = {cid} THEN {d}" for cid, d in dists.items()
    ) + " END"
    b_entries = ", ".join(
        f"named_struct('d', CASE WHEN `{cluster_col}` = {cid} THEN NULL "
        f"ELSE {d} END, 'cid', {cid})"
        for cid, d in dists.items()
    )
    b = (
        f"array_min(transform(filter(array({b_entries}), "
        "s -> s.d IS NOT NULL), s -> s.d))"
    )
    out = df.withColumn("a", F.expr(a)).withColumn("b", F.expr(b))
    mx = F.greatest(F.col("a"), F.col("b"))
    return out.withColumn(
        "silhouette",
        F.when(mx > 0.0, (F.col("b") - F.col("a")) / mx),
    )


def adjusted_rand_index(
    df: DataFrame,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """One row ``(n, ari)`` — ARI between two label columns (NULL
    labels excluded).  All pair counts exact; one final division."""
    flt = df.filter(F.col(label_a).isNotNull() & F.col(label_b).isNotNull())
    cells = flt.groupBy(
        F.col(label_a).alias("x"), F.col(label_b).alias("y")
    ).agg(F.count(F.lit(1)).alias("o"))

    def pairs2(c: Column) -> Column:
        # 2·C(c,2) = c·(c−1), exact decimal
        cd = c.cast(_DEC)
        return cd * (cd - F.lit(1).cast(_DEC))

    sij = cells.agg(
        F.sum(pairs2(F.col("o"))).alias("p_ij"),
        F.sum("o").alias("n"),
    )
    sa = (
        cells.groupBy("x")
        .agg(F.sum("o").alias("a"))
        .agg(F.sum(pairs2(F.col("a"))).alias("p_a"))
    )
    sb = (
        cells.groupBy("y")
        .agg(F.sum("o").alias("b"))
        .agg(F.sum(pairs2(F.col("b"))).alias("p_b"))
    )
    j = sij.crossJoin(sa).crossJoin(sb)
    nd = F.col("n").cast(_DEC)
    n2 = nd * (nd - F.lit(1).cast(_DEC))  # 2·C(n,2)
    # ARI = (p_ij − p_a·p_b/n2) / (½(p_a+p_b) − p_a·p_b/n2); multiply
    # num and den by 2·n2: every term below is an exact integer
    num = F.lit(2).cast(_DEC) * (n2 * F.col("p_ij") - F.col("p_a") * F.col("p_b"))
    den = n2 * (F.col("p_a") + F.col("p_b")) - F.lit(2).cast(_DEC) * (
        F.col("p_a") * F.col("p_b")
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.when(
            den != F.lit(0).cast(_DEC),
            num.cast("double") / den.cast("double"),
        ).alias("ari"),
    )


def _moment_sums(df, cluster_col, vec_col, quant):
    """Shared L234/L235 core: exact DECIMAL per-(cluster, dim) moment
    sums over micro-unit quantized components u = ⌊x·quant⌋ —
    ``per`` = (_g, _d, _nj, _s, _q) and ``sizes`` = (cluster, _n)."""
    dec = "decimal(38,0)"
    base = df.filter(
        F.col(cluster_col).isNotNull() & F.col(vec_col).isNotNull()
    )
    ex = base.select(
        F.col(cluster_col).alias("_g"),
        F.posexplode(vec_col).alias("_d", "_v"),
    )
    if validation_enabled():
        n_bad = ex.filter(F.col("_v").isNull()).count()
        if n_bad:
            raise ValueError(
                f"clustereval: {n_bad} NULL vector component(s) — counts "
                "and sums would silently diverge; impute or drop first"
            )
    u = F.floor(F.col("_v") * F.lit(float(quant))).cast(dec)
    per = ex.groupBy("_g", "_d").agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum(u).alias("_s"),
        F.sum(u * u).alias("_q"),
    )
    sizes = base.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("_n"))
    return per, sizes


def calinski_harabasz(
    df: DataFrame,
    cluster_col: str,
    vec_col: str = "embedding",
    quant: int = 1 << 20,
) -> DataFrame:
    """One row ``(k, n, ssb, ssw, ch)`` — the Calinski-Harabasz
    variance-ratio index (L234): between-cluster vs within-cluster
    dispersion of a labeled vector table,

        CH = (SSB/(k−1)) / (SSW/(N−k))

    — the third leg of the clustering-evaluation family (L156
    silhouette judges POINTS, L157 ARI compares LABELINGS, CH scores
    the PARTITION's geometry).

    Exactness: every vector component is quantized to exact integer
    micro-units u = ⌊x·quant⌋ (a float32-precision component times a
    power of two is EXACT, so the default 2²⁰ grid loses nothing for
    unit-scale embeddings; CH itself is invariant to the uniform
    scaling).  From exact DECIMAL per-(cluster, dim) sums S, Q and
    counts, the computational identities

        SSW = Σ_{j,d} (Q_jd − S_jd²/n_j)
        SSB = Σ_{j,d} S_jd²/n_j − Σ_d T_d²/N      (T_d = Σ_j S_jd)

    fold over the BOUNDED sorted (cluster × dim) list — each term a
    fixed IEEE tree, both sums ordered folds, CH one final tree —
    bit-identical, ungridded.  ssb/ssw are reported in micro-unit²
    (documented; the RATIO is scale-free).  k < 2, N ≤ k, or SSW ≤ 0
    → NULL ch.

    Scale shape: one narrow posexplode projection + one combinable
    (cluster, dim) groupBy — 100 TB of vectors scans once; state is
    k·d cells.

    No reference counterpart; clustering-evaluation analytics per
    SURVEY §2.11.
    """
    per, sizes = _moment_sums(df, cluster_col, vec_col, quant)
    tot = sizes.agg(
        F.count(F.lit(1)).alias("k"), F.sum("_n").alias("n")
    )
    njd = lambda v: v["_nj"].cast("double")  # noqa: E731
    sd = lambda v: v["_s"].cast("double")  # noqa: E731
    arr = per.agg(
        F.sort_array(
            F.collect_list(F.struct("_g", "_d", "_nj", "_s", "_q"))
        ).alias("_lv")
    )
    ssw = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_q"].cast("double") - (sd(v) * sd(v)) / njd(v)),
    )
    parta = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda acc, v: acc + (sd(v) * sd(v)) / njd(v),
    )
    dims = per.groupBy("_d").agg(F.sum("_s").alias("_t"))
    darr = dims.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_d"), F.col("_t")))
        ).alias("_dv")
    )
    staged = (
        arr.crossJoin(F.broadcast(darr)).crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    partb = F.aggregate(
        F.col("_dv"),
        F.lit(0.0),
        lambda acc, v: acc
        + (v["_t"].cast("double") * v["_t"].cast("double")) / nd,
    )
    ssb = parta - partb
    ch = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (ssw > 0.0)
    return staged.select(
        "k",
        "n",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        F.when(ok, ch).alias("ch"),
    )


def davies_bouldin(
    df: DataFrame,
    cluster_col: str,
    vec_col: str = "embedding",
    quant: int = 1 << 20,
) -> DataFrame:
    """One row ``(k, n, db)`` — the Davies-Bouldin index (L235):
    average worst-case cluster-pair similarity (lower = better
    separated), the fourth leg of the clustering-eval family and the
    one that penalizes the SPECIFIC bad pair CH (L234) can average
    away:

        s_j  = sqrt(SSW_j / n_j)              per-cluster scatter
        d_ab = ‖m_a − m_b‖                     cluster-mean distance
        DB   = (1/k) Σ_a max_{b≠a} (s_a + s_b)/d_ab

    Cluster centers are the EMPIRICAL means (the classical
    definition), so everything derives from the same exact DECIMAL
    micro-unit moment sums as L234 (shared ``_moment_sums`` core —
    scale cancels in DB exactly as in CH): SSW_j by the computational
    identity, means as one division per (cluster, dim), d_ab² as an
    ordered fold over the bounded dim-sorted pair grid, the k maxima
    exact, the final mean a fold over the sorted cluster list.
    Bit-identical, ungridded.  Identical cluster means (d_ab = 0) make
    that pair's ratio NULL; a cluster whose every ratio is NULL, or
    k < 2, → NULL db.

    Scale shape: one narrow posexplode projection + one combinable
    (cluster, dim) groupBy + bounded k²·d pair folds.  100 TB of
    vectors scans once.

    No reference counterpart; clustering-evaluation analytics per
    SURVEY §2.11.
    """
    per, sizes = _moment_sums(df, cluster_col, vec_col, quant)
    njd = F.col("_nj").cast("double")
    sd = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    scat = per.groupBy("_g").agg(
        F.max("_nj").alias("_nj"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("_d"),
                        qd.alias("_qd"),
                        sd.alias("_sd"),
                        njd.alias("_njd"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, v: acc
            + (v["_qd"] - (v["_sd"] * v["_sd"]) / v["_njd"]),
        ).alias("_ssw"),
    ).select(
        "_g",
        "_nj",
        F.sqrt(F.col("_ssw") / F.col("_nj").cast("double")).alias("_sc"),
    )
    means = per.select(
        "_g", "_d", (sd / njd).alias("_m")
    )
    ma = means.select(
        F.col("_g").alias("_ga"), "_d", F.col("_m").alias("_ma")
    )
    mb = means.select(
        F.col("_g").alias("_gb"), "_d", F.col("_m").alias("_mb")
    )
    pd_ = ma.join(mb, "_d").filter(F.col("_ga") != F.col("_gb"))
    d2 = pd_.groupBy("_ga", "_gb").agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("_d"), F.col("_ma"), F.col("_mb"))
                )
            ),
            F.lit(0.0),
            lambda acc, v: acc
            + (v["_ma"] - v["_mb"]) * (v["_ma"] - v["_mb"]),
        ).alias("_d2")
    )
    sa = scat.select(F.col("_g").alias("_ga"), F.col("_sc").alias("_sa"))
    sb = scat.select(F.col("_g").alias("_gb"), F.col("_sc").alias("_sb"))
    ratios = (
        d2.join(sa, "_ga")
        .join(sb, "_gb")
        .select(
            "_ga",
            F.when(
                F.col("_d2") > 0.0,
                (F.col("_sa") + F.col("_sb")) / F.sqrt(F.col("_d2")),
            ).alias("_r"),
        )
    )
    worst = ratios.groupBy("_ga").agg(F.max("_r").alias("_w"))
    out = worst.agg(
        F.count(F.lit(1)).alias("_kp"),
        F.sum(F.when(F.col("_w").isNull(), 1).otherwise(0)).alias("_bad"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("_ga"), F.col("_w")))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v["_w"],
        ).alias("_sumw"),
    )
    tot = sizes.agg(
        F.count(F.lit(1)).alias("k"), F.sum("_n").alias("n")
    )
    staged = out.crossJoin(F.broadcast(tot))
    ok = (F.col("k") >= 2) & (F.col("_bad") == 0)
    return staged.select(
        "k",
        "n",
        F.when(ok, F.col("_sumw") / F.col("k").cast("double")).alias("db"),
    )
