"""Triangle counting + local clustering coefficient over an edge list.

A KG-construction pipeline needs graph diagnostics beyond components and
PageRank: triangle counts drive clustering-coefficient quality metrics
(how clique-like are entity neighborhoods — a spam/boilerplate signal on
co-mention graphs) and feed downstream community detection.

Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW'11).  Every
undirected edge is oriented from its lower-(degree, id) endpoint to the
higher one; each triangle {x, y, z} (ranked x < y < z) is then generated
EXACTLY once as a wedge at its minimum-rank apex x — join the oriented
edge list with itself on the apex — and closed by probing the oriented
edge (y, z).  Orienting by degree bounds each apex's wedge fan-out by
O(sqrt m) regardless of hub skew: a degree-10^6 hub emits no wedges at
all unless its neighbors are higher-degree still — the "last reducer"
never happens, which is the property that matters on a 10^12-edge
co-mention graph.

Cost: one degree aggregation + three keyed equi-joins (apex wedge
self-join, closing-edge probe), all on node/pair keys — no theta-joins,
nothing quadratic in degree for the skewed case.

No reference counterpart (the reference builds no graph metrics); the
operator extends graph/pagerank.py's analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected, deduped, self-loop-free edges as (u, v) with u < v."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles of the undirected simple graph induced by
    ``edges(src, dst)`` (self-loops dropped, multi-edges collapsed,
    direction ignored): one row (a, b, c) per triangle with a < b < c in
    natural id order — each triangle exactly once."""
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # rank = (deg, node): total order; orient every edge low-rank -> high-rank
    ranked = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.struct(F.col("dv"), F.col("v"))).otherwise(
            F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))
        ).alias("hi_rank"),
    ).localCheckpoint()
    # wedges at the minimum-rank apex; rank structs order the two arms so
    # each unordered wedge is generated once, arms (y, z) with y below z
    a = oriented.alias("a")
    b = oriented.alias("b")
    wedges = a.join(b, F.col("a.lo") == F.col("b.lo")).filter(
        F.col("a.hi_rank") < F.col("b.hi_rank")
    ).select(
        F.col("a.lo").alias("apex"),
        F.col("a.hi").alias("y"),
        F.col("b.hi").alias("z"),
    )
    # close the wedge: (y, z) oriented low-rank -> high-rank is exactly
    # how the third edge appears in `oriented`
    closed = wedges.join(
        oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z")),
        ["y", "z"],
    )
    return closed.select(
        F.least("apex", "y", "z").alias("a"),
        F.greatest(
            F.least(F.col("apex"), F.col("y")),
            F.least(F.col("apex"), F.col("z")),
            F.least(F.col("y"), F.col("z")),
        ).alias("b"),
        F.greatest("apex", "y", "z").alias("c"),
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation + local clustering coefficient:
    (node, deg, n_triangles, clustering) for every node touching an
    edge.  clustering = 2*T(v) / (deg(v) * (deg(v) - 1)) — a single
    integer-ratio division, so the double is engine-reproducible; 0.0
    for degree-1 nodes (the usual convention)."""
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangles(e, "u", "v")
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce("n_triangles", F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
