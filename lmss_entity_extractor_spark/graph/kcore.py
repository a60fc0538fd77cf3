"""k-core extraction (Seidman, Social Networks'83): the maximal
subgraph in which every node keeps degree ≥ k — the standard density
filter before trusting KG neighborhoods (entities surviving the 3-core
of the co-mention graph are structurally corroborated; degree-1
tail noise peels away).

Algorithm: synchronous peeling to a fixpoint.  Each round computes
degrees WITHIN the remaining subgraph (one keyed aggregation) and drops
nodes below k (one broadcast-friendly semi-join of edges onto the
surviving node set).  Rounds are data-dependent but bounded by the
peel depth (≤ longest chain of cascading removals, typically ≪ 20 on
organic graphs); each round flattens lineage with ``localCheckpoint``
(the closure/pagerank discipline) and the loop fails LOUDLY after
``max_rounds`` instead of silently returning a non-core (the
components.py non-convergence discipline).

Fixpoint means the result is round-count-independent — any engine that
peels the same rule converges to the same set, which is what lets a
fixed-unroll SQL oracle (enough rounds for the fixture + idempotent
thereafter) check the iterative machinery exactly.

Input edges are treated as UNDIRECTED and are symmetrized + dedup'd
internally; self-loops are dropped (a self-loop would let an isolated
node count itself toward its own degree).

No reference counterpart; extends the KG quality family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """edges(src, dst) -> (node, degree) for the k-core: every node of
    the maximal subgraph where all degrees are ≥ k, with its degree
    inside that subgraph.  Empty result when no k-core exists."""
    if k < 1:
        raise ValueError("k must be >= 1")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = und.count()
    for _ in range(max_rounds):
        deg = und.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        survivors = deg.filter(F.col("degree") >= k).select("node").localCheckpoint()
        pruned = (
            und.join(survivors.withColumnRenamed("node", "a"), "a", "semi")
            .join(survivors.withColumnRenamed("node", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint()
        )
        n_pruned = pruned.count()
        if n_pruned == n_edges:
            return und.groupBy(F.col("a").alias("node")).agg(
                F.count(F.lit(1)).alias("degree")
            )
        und, n_edges = pruned, n_pruned
    raise RuntimeError(
        f"kcore did not converge within {max_rounds} peel rounds — "
        "raise max_rounds (peel depth exceeds the bound)"
    )
