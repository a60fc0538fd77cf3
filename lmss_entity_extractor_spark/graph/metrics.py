"""Graph partition/mixing diagnostics (L148/L149): Newman modularity
of a community assignment and the degree-assortativity coefficient —
the two numbers that tell you whether a constructed KG has real
community structure and whether hubs attach to hubs (assortative) or
to leaves (disassortative, the usual KG/BA shape).  Both are exact
rationals of integer edge/degree statistics, so each is ONE final
IEEE division over DECIMAL(38,0) sums — bit-identical, no grid.

L148 — modularity (Newman 2004): for undirected edges and a node →
community map,

    Q = Σ_c e_c/m − (d_c/2m)²  =  (4m·Σ e_c − Σ d_c²) / (4m²)

with m = |edges|, e_c = intra-community edge count, d_c = total degree
of community c.  Self-loops follow the multigraph convention: degree
+2, intra-edge +1.  Nodes missing from the community map are refused
loudly (a silent drop would inflate Q).

L149 — degree assortativity (Newman 2002, full-degree convention as
in networkx): Pearson correlation of endpoint degrees over DIRECTED
edge copies (each undirected edge counted both ways, so Σx = Σy):

    r = (N·Σxy − (Σx)²) / (N·Σxx − (Σx)²),   N = 2m

Degenerate variance (all endpoints same degree) → NULL.

Scale shape: degrees are one combinable groupBy over endpoints; the
community/degree lookups are keyed equi-joins against node-sized
tables (broadcast when small); the statistics are single combinable
aggregations.  The 100 TB edge list is scanned a constant number of
times; nothing is quadratic, nothing is collected.

No reference counterpart; graph diagnostics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _degrees(edges: DataFrame, src: str, dst: str) -> DataFrame:
    ends = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """One row ``(m, n_communities, q)``.  ``communities`` maps every
    node appearing in ``edges`` to exactly one community; unmapped
    endpoints raise (LEFT-join-then-assert, not a silent inner drop)."""
    comm = communities.select(
        F.col(node_col).alias("node"), F.col(community_col).alias("_c")
    )
    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .join(comm.withColumnRenamed("_c", "_cu"), F.col("_u") == F.col("node"), "left")
        .drop("node")
        .join(comm.withColumnRenamed("_c", "_cv"), F.col("_v") == F.col("node"), "left")
        .drop("node")
    )
    n_unmapped = e.filter(
        F.col("_cu").isNull() | F.col("_cv").isNull()
    ).count()
    if n_unmapped:
        raise ValueError(
            f"modularity: {n_unmapped} edge(s) touch nodes missing from "
            "the community map — fix the assignment; a silent drop "
            "would bias Q"
        )
    m_intra = e.groupBy("_cu").agg(
        F.sum((F.col("_cu") == F.col("_cv")).cast("long")).alias("e_c")
    )
    # community total degree: degree-weighted membership
    d_c = (
        _degrees(edges, src, dst)
        .join(comm, "node")
        .groupBy("_c")
        .agg(F.sum("deg").alias("d_c"))
    )
    stats = (
        d_c.join(m_intra, d_c["_c"] == m_intra["_cu"], "left")
        .select(
            F.coalesce(F.col("e_c"), F.lit(0)).cast(_DEC).alias("e_c"),
            F.col("d_c").cast(_DEC).alias("d_c"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum("e_c").alias("se"),
            F.sum(F.col("d_c") * F.col("d_c")).alias("sd2"),
        )
    )
    m_cnt = edges.count()
    m4 = F.lit(4 * m_cnt).cast(_DEC)
    num = m4 * F.col("se") - F.col("sd2")
    den = F.lit(4 * m_cnt * m_cnt).cast(_DEC)
    return stats.select(
        F.lit(m_cnt).cast("long").alias("m"),
        "n_communities",
        F.when(
            F.lit(m_cnt) > 0, num.cast("double") / den.cast("double")
        ).alias("q"),
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One row ``(m, r)`` — full-degree Pearson assortativity over both
    orientations of every edge.  Zero degree variance → NULL r."""
    deg = _degrees(edges, src, dst)
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    both = e.unionAll(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
    dx = deg.select(F.col("node").alias("_nu"), F.col("deg").alias("_dx"))
    dy = deg.select(F.col("node").alias("_nv"), F.col("deg").alias("_dy"))
    paired = (
        both.join(dx, F.col("_u") == F.col("_nu"))
        .join(dy, F.col("_v") == F.col("_nv"))
        .select(
            F.col("_dx").cast(_DEC).alias("x"),
            F.col("_dy").cast(_DEC).alias("y"),
        )
    )
    s = paired.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        (F.col("n") / F.lit(2).cast(_DEC)).cast("long").alias("m"),
        F.when(
            den != F.lit(0).cast(_DEC),
            num.cast("double") / den.cast("double"),
        ).alias("r"),
    )


def reciprocity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One row ``(m, m_reciprocated, r)`` — directed-graph reciprocity
    (L187): the fraction of distinct non-loop directed edges whose
    reverse edge also exists (r = |E ∩ Eᵀ| / |E|, exact integers, ONE
    division).  High reciprocity on a KG predicate usually means the
    predicate should have been modeled symmetric (or its inverse is
    being materialized twice) — a schema smell detector.  Self-loops
    excluded; multi-edges collapsed.  Two scans + one self-join on the
    node-pair key."""
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .distinct()
    )
    rev = e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    recip = e.join(rev, ["_u", "_v"]).count()
    m = e.count()
    out = e.sparkSession.createDataFrame(
        [(m, recip)], "m bigint, m_reciprocated bigint"
    )
    return out.select(
        "m",
        "m_reciprocated",
        F.when(
            F.col("m") > 0,
            F.col("m_reciprocated").cast("double") / F.col("m").cast("double"),
        ).alias("r"),
    )


def conductance(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """``(community, vol, cut, phi)`` — per-community conductance
    (L188), the cut-quality companion to modularity (L148): φ(S) =
    cut(S, S̄) / min(vol(S), vol(G)−vol(S)) over the undirected
    multigraph (degree volumes; self-loops add 2 to volume, never to
    the cut).  Exact integers, ONE division; min-side volume 0 → NULL.
    Unmapped endpoints REFUSED (the L148 guard).  Two keyed joins
    against the community map + combinable aggs."""
    comm = communities.select(
        F.col(node_col).alias("node"), F.col(community_col).alias("_c")
    )
    e = (
        edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
        .join(
            comm.select(F.col("node").alias("_u"), F.col("_c").alias("_cu")),
            "_u",
            "left",
        )
        .join(
            comm.select(F.col("node").alias("_v"), F.col("_c").alias("_cv")),
            "_v",
            "left",
        )
    )
    n_unmapped = e.filter(F.col("_cu").isNull() | F.col("_cv").isNull()).count()
    if n_unmapped:
        raise ValueError(
            f"conductance: {n_unmapped} edge(s) touch nodes missing from "
            "the community map — fix the assignment (the L148 guard)"
        )
    # volume: degree mass per community (self-loop counts 2)
    vol = (
        e.select(F.col("_cu").alias("_c"))
        .unionAll(e.select(F.col("_cv").alias("_c")))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("vol"))
    )
    cut = (
        e.filter(F.col("_cu") != F.col("_cv"))
        .select(F.explode(F.array("_cu", "_cv")).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    total = e.count() * 2
    out = vol.join(cut, "_c", "left")
    cut0 = F.coalesce(F.col("cut"), F.lit(0))
    other = F.lit(total) - F.col("vol")
    min_vol = F.least(F.col("vol"), other)
    return out.select(
        F.col("_c").alias("community"),
        "vol",
        cut0.alias("cut"),
        F.when(
            min_vol > 0, cut0.cast("double") / min_vol.cast("double")
        ).alias("phi"),
    )


def attribute_assortativity(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    attr_col: str = "attr",
) -> DataFrame:
    """Categorical attribute assortativity (L406): one row ``(m,
    n_classes, r)`` — do nodes link to SAME-class nodes (Newman 2003
    discrete mixing-matrix coefficient), the categorical sibling of
    degree assortativity (L149) and the normalized counterpart of
    modularity's quality view (L148 scores a PARTITION; r scores an
    ATTRIBUTE against the random-mixing baseline, −1..1):

        r = (M·Σᵢmᵢᵢ − Σᵢaᵢ·bᵢ) / (M² − Σᵢaᵢ·bᵢ)

    over BOTH orientations of every edge (M = 2m directed ends; the
    L149 convention, which makes the mixing matrix symmetric so
    aᵢ = bᵢ), with mᵢᵢ the same-class end counts and aᵢ the class
    margins — ALL exact DECIMAL integers from two keyed joins
    against the node-sized attribute map plus combinable aggs, ONE
    final division, bit-identical ungridded.  Self-loops contribute
    two same-class ends (multigraph convention, pinned by test —
    the L148 discipline).  Endpoints MISSING from the attribute map
    are REFUSED loudly (a silent inner-join drop would bias r — the
    L148 rule); perfectly assortative → r = 1 exactly; single-class
    graphs → NULL (denominator 0: no mixing to measure).

    No reference counterpart; graph analytics per SURVEY §2.11."""
    attrs = nodes.select(
        F.col(node_col).alias("_n"), F.col(attr_col).alias("_c")
    )
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    both = e.unionAll(
        e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    )
    n_ends = both.count()
    paired = (
        both.join(
            attrs.select(
                F.col("_n").alias("_nu"), F.col("_c").alias("_cu")
            ),
            F.col("_u") == F.col("_nu"),
        )
        .join(
            attrs.select(
                F.col("_n").alias("_nv"), F.col("_c").alias("_cv")
            ),
            F.col("_v") == F.col("_nv"),
        )
        .select("_cu", "_cv")
    )
    n_paired = paired.count()
    if n_paired != n_ends:
        raise ValueError(
            f"attribute_assortativity: {n_ends - n_paired} edge "
            "end(s) missing from the attribute map — a silent drop "
            "would bias r; complete the map first"
        )
    margins = paired.groupBy(F.col("_cu").alias("_c")).agg(
        F.count(F.lit(1)).alias("_a")
    )
    s = paired.agg(
        F.count(F.lit(1)).cast(_DEC).alias("M"),
        F.sum(
            F.when(F.col("_cu") == F.col("_cv"), 1).otherwise(0)
        ).cast(_DEC).alias("_tr"),
    )
    ab = margins.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.col("_a").cast(_DEC) * F.col("_a").cast(_DEC)).alias(
            "_sab"
        ),
    )
    row = s.crossJoin(ab)
    num = F.col("M") * F.col("_tr") - F.col("_sab")
    den = F.col("M") * F.col("M") - F.col("_sab")
    return row.select(
        (F.col("M") / F.lit(2).cast(_DEC)).cast("long").alias("m"),
        F.col("n_classes"),
        F.when(
            den != F.lit(0).cast(_DEC),
            num.cast("double") / den.cast("double"),
        ).alias("r"),
    )
