"""Fixed-iteration PageRank over an edge list — the iterative graph
workload beyond transitive closure (graph/closure.py): rank mass flows
along out-edges under damping, converging toward the stationary
distribution.

Spark shape: ranks and out-degrees are keyed DataFrames; each iteration
is one join (ranks -> edges, keyed shuffle) + one aggregation
(contributions by destination) + a left join back onto the node set so
dangling and source-only nodes keep receiving the teleport term.
Lineage is flattened per iteration with ``localCheckpoint`` (the same
discipline as closure/components — an unrolled 10-iteration plan
otherwise grows exponentially under self-joins).

Determinism: a FIXED iteration count (no float-tolerance stopping rule),
so any engine that runs the same recurrence produces the same values up
to floating-point associativity — the DuckDB oracle runs the identical
unrolled recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> (node, rank) after ``n_iters`` synchronous
    iterations of rank = (1-d)/N + d * Σ rank(in)/outdeg(in).

    Dangling nodes (no out-edges) keep their rank out of circulation
    (the simple variant — no dangling-mass redistribution — mirrored
    exactly by the oracle)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty edge list -> empty, correctly-typed result (not a
        # ZeroDivisionError from 1/n)
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(F.count(F.lit(1)).alias("outdeg"))
    # keep (node, outdeg, rank) co-partitioned across iterations
    state = nodes.join(outdeg, "node", "left").select(
        "node", "outdeg", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint()

    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).localCheckpoint()
    for _ in range(n_iters):
        contrib = (
            e.join(state.filter(F.col("outdeg").isNotNull()), "node")
            .select(F.col("_dst").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        state = (
            state.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return state.select("node", "rank")
