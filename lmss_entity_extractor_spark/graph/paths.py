"""Bounded-hop BFS: minimal hop counts from a source set over an edge
list — the k-hop-neighborhood / unweighted-shortest-path query a KG
serves constantly ("everything within 3 hops of this entity").

Frontier-expansion BFS, one round per hop level:

  frontier(h+1) = distinct successors of frontier(h) minus visited

Each round costs one keyed equi-join (frontier x edges on the source
node) plus one left-anti join against the visited set — both shuffle on
the node key, nothing quadratic.  The frontier is the only iterated
state and it SHRINKS once the wave passes the graph's bulk; ``visited``
grows to the reachable set, which is the answer itself, so no extra
state beyond the output is held.  Rounds = ``max_hops`` (bounded by
contract, not by convergence luck); lineage is flattened per round with
``localCheckpoint`` like graph/closure.py and ops/components.py.

Unlike transitive_closure (graph/closure.py), which materializes ALL
reachable pairs (quadratic in the worst case), this keeps one row per
reached node — the shape that survives a 10^12-edge graph when you only
need distances from a bounded source set.

No reference counterpart (the reference computes no graph metrics);
extends the graph analytics family (closure, pagerank, components,
triangles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_hops(
    edges: DataFrame,
    sources: DataFrame | Sequence,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """(node, hops): minimal number of edge hops from ANY source node,
    for every node reachable within ``max_hops``.  Sources themselves
    appear with hops 0 (even if absent from the edge list); unreachable
    nodes are absent.  ``sources`` is a one-column DataFrame or a
    sequence of ids; ``directed=False`` walks edges both ways."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    if isinstance(sources, DataFrame):
        if len(sources.columns) != 1:
            raise ValueError("sources DataFrame must have exactly one column")
        srcs = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    else:
        spark = edges.sparkSession
        srcs = spark.createDataFrame(
            [(s,) for s in sources], schema=edges.select(F.col(src).alias("node")).schema
        ).distinct()
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    e = e.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    visited = srcs.withColumn("hops", F.lit(0)).localCheckpoint()
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited
