"""Neighborhood-overlap link prediction over an edge list: for node
pairs, how many neighbors do they share, and how similar are their
neighborhoods?  The classic common-neighbors / Jaccard scores
(Liben-Nowell & Kleinberg, CIKM'03) — on a KG this ranks missing-edge
candidates (entities that co-occur with the same things probably
relate) and flags near-duplicate entities that canonicalization missed.

Relational shape: symmetric adjacency self-joined on the shared
neighbor (the "center") generates each candidate pair once per common
neighbor; one keyed count-aggregate collapses that to the score.  Cost
is sum over centers of deg^2 — the wedge explosion lives on hub
centers, so ``max_degree`` (standard practice at web scale) excludes
super-hub centers from wedge generation: a stop-word-like entity with
10^6 neighbors contributes 10^12 wedges and near-zero signal.  The cap
is an explicit, documented approximation — pairs lose only the paths
through dropped hubs; ``None`` keeps the computation exact.

Jaccard = common / (deg_a + deg_b - common) is a single division of
exact integers — engine-reproducible bit-for-bit.

No reference counterpart; extends the graph analytics family
(closure, pagerank, components, triangles, paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _canonical_edges


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """(a, b, common, deg_a, deg_b, jaccard) for node pairs a < b of the
    induced simple undirected graph sharing >= ``min_common`` neighbors.
    Existing edges are excluded by default (the link-PREDICTION set);
    ``include_existing=True`` keeps them (the similarity view).
    ``max_degree`` drops centers of higher degree from wedge generation
    (hub-cap approximation; None = exact)."""
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = e.select(F.col("u").alias("center"), F.col("v").alias("nbr")).union(
        e.select(F.col("v").alias("center"), F.col("u").alias("nbr"))
    )
    if max_degree is not None:
        keep = deg.filter(F.col("deg") <= max_degree).select(
            F.col("node").alias("center")
        )
        sym = sym.join(keep, "center")
    x, y = sym.alias("x"), sym.alias("y")
    pairs = (
        x.join(y, F.col("x.center") == F.col("y.center"))
        .filter(F.col("x.nbr") < F.col("y.nbr"))
        .select(F.col("x.nbr").alias("a"), F.col("y.nbr").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_common)
    )
    if not include_existing:
        pairs = pairs.join(
            e.select(F.col("u").alias("a"), F.col("v").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    return (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            (
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """(a, b, common, aa, ra) — the degree-weighted overlap scores
    (Adamic-Adar Σ 1/ln(deg z), resource allocation Σ 1/deg z over
    common neighbors z): rarer shared neighbors count for more, which
    is what makes AA beat raw common-neighbors on KGs with hub
    entities.

    Float discipline: both scores are sums of per-neighbor terms, so
    they fold over the pair's common-neighbor list SORTED by neighbor
    id (0.0-prepended left-assoc — the L39 discipline); a wedge center
    has degree >= 2 by construction, so ln(deg) > 0.  The list is
    bounded by the pair's common-neighbor count (capped in practice by
    ``max_degree``, the same hub knob as `link_prediction_scores`)."""
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = e.select(F.col("u").alias("center"), F.col("v").alias("nbr")).union(
        e.select(F.col("v").alias("center"), F.col("u").alias("nbr"))
    )
    if max_degree is not None:
        keep = deg.filter(F.col("deg") <= max_degree).select(
            F.col("node").alias("center")
        )
        sym = sym.join(keep, "center")
    symd = sym.join(
        deg.select(F.col("node").alias("center"), F.col("deg").alias("deg_c")),
        "center",
    )
    x, y = symd.alias("x"), symd.alias("y")
    wedges = (
        x.join(y, F.col("x.center") == F.col("y.center"))
        .filter(F.col("x.nbr") < F.col("y.nbr"))
        .select(
            F.col("x.nbr").alias("a"),
            F.col("y.nbr").alias("b"),
            F.col("x.center").alias("z"),
            F.col("x.deg_c").alias("deg_z"),
        )
    )
    packed = wedges.groupBy("a", "b").agg(
        F.sort_array(F.collect_list(F.struct("z", "deg_z"))).alias("_zs")
    )
    pairs = packed.filter(F.size("_zs") >= min_common)
    if not include_existing:
        pairs = pairs.join(
            e.select(F.col("u").alias("a"), F.col("v").alias("b")),
            ["a", "b"],
            "left_anti",
        )
    aa = F.aggregate(
        "_zs",
        F.lit(0.0),
        lambda acc, s: acc + F.lit(1.0) / F.log(s["deg_z"].cast("double")),
    )
    ra = F.aggregate(
        "_zs",
        F.lit(0.0),
        lambda acc, s: acc + F.lit(1.0) / s["deg_z"].cast("double"),
    )
    return pairs.select(
        "a",
        "b",
        F.size("_zs").alias("common"),
        aa.alias("aa"),
        ra.alias("ra"),
    )
