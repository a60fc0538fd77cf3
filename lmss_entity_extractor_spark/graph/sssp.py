"""Hop-bounded single-source(-set) shortest paths — Bellman-Ford
rounds on the min-plus semiring (Cormen et al. §24.1, the standard
bulk-synchronous SSSP of Pregel/GraphX re-expressed relationally):
dist_i(v) = min(dist_{i-1}(v), min over edges u→v of dist_{i-1}(u)+w).
After R rounds the result is EXACTLY "cheapest path using ≤ R hops" —
a well-defined contract that needs no convergence argument, and the
right shape for KG proximity queries ("entities within 4 hops of this
conversation's seed set, by edge cost").

Determinism: min is order-independent (unlike sum), so with integer
weights every engine running the same rounds produces bit-identical
distances — the DuckDB oracle unrolls the identical recurrence.

Spark shape per round: one join keyed on the frontier node, one
map-side-combinable min-aggregation, lineage flattened with
``localCheckpoint`` (the closure/pagerank discipline).  Hot nodes
fan out along their edges exactly once per round — no quadratic blowup.

No reference counterpart; extends the KG analytics family
(SURVEY §2.11, weighted companion to the L45 bounded-hop BFS).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame | Sequence,
    n_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """edges(src, dst, w) + sources -> (node, dist): the minimum path
    cost from ANY source using at most ``n_rounds`` hops; unreachable
    nodes are absent.  Negative weights are rejected loudly (with a
    hop bound they'd be well-defined but are invariably data bugs in
    a KG cost model)."""
    if edges.filter(F.col(weight) < 0).limit(1).count() > 0:
        raise ValueError("shortest_paths: negative edge weights present")
    if isinstance(sources, DataFrame):
        if len(sources.columns) != 1:
            raise ValueError("sources DataFrame must have exactly one column")
        srcs = sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    else:
        srcs = (
            edges.sparkSession.createDataFrame(
                [(s,) for s in sources],
                schema=edges.select(F.col(src).alias("node")).schema,
            ).distinct()
        )
    e = edges.select(
        F.col(src).alias("node"),
        F.col(dst).alias("_dst"),
        F.col(weight).cast("long").alias("_w"),
    ).localCheckpoint()
    dist = srcs.select("node", F.lit(0).cast("long").alias("dist")).localCheckpoint()
    for _ in range(n_rounds):
        relaxed = e.join(dist, "node").select(
            F.col("_dst").alias("node"), (F.col("dist") + F.col("_w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist
