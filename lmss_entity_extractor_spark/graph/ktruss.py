"""k-truss decomposition (Cohen, NSA TR'08): the maximal subgraph in
which every EDGE closes at least k−2 triangles — a stronger cohesion
filter than k-core (it certifies each relationship with common
neighbors, not just each endpoint with degree), and the standard
pre-filter before trusting KG relationship neighborhoods.

Algorithm: synchronous support peeling to a fixpoint, the ``kcore.py``
discipline applied to edges instead of nodes.  Edges are canonicalized
undirected (a < b, self-loops dropped, dedup'd).  Each round:

- enumerate triangles ORIENTED (x < y < z) via two equi-joins of the
  canonical edge list against itself — every triangle counted exactly
  once, no permutation blowup (the `triangles` operator's shape; join
  keys hash-partition, nothing is all-pairs);
- per-edge support = one explode of each triangle into its three edges
  + ONE map-side-combinable count;
- keep edges with support ≥ k−2 (a left-semi join), localCheckpoint to
  flatten lineage, stop when the edge count stops falling — fixpoint,
  so the result is round-count-independent and a fixed-unroll SQL
  oracle checks the iterative machinery exactly (kcore's oracle
  argument).

LOUD RuntimeError past ``max_rounds`` rather than a silent non-truss
(components.py non-convergence discipline).

Scale: each round is two joins + one aggregate on the SURVIVING edge
set, which only shrinks; skew on hub nodes is bounded because the
orientation (x < y < z) splits each high-degree node's wedge load
across the id order.

No reference counterpart; extends the KG quality family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _support(edges: DataFrame) -> DataFrame:
    """(a, b, support) over the canonical (a < b) edge set — support 0
    edges are ABSENT (they close no triangle)."""
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    tri = wedges.join(
        edges.select(F.col("a").alias("y"), F.col("b").alias("z")),
        ["y", "z"],
    )
    tri_edges = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    return tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """edges(src, dst) -> (a, b, support) for the k-truss: the edges of
    the maximal subgraph where every edge closes ≥ k−2 triangles, with
    the support measured INSIDE that subgraph.  Empty when no k-truss
    exists."""
    if k < 3:
        raise ValueError("k must be >= 3 (k=3 keeps edges in >= 1 triangle)")
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = cur.count()
    for _ in range(max_rounds):
        sup = _support(cur)
        kept = (
            sup.filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint()
        )
        n_kept = kept.count()
        if n_kept == n_edges:
            # fixpoint: sup was measured inside cur == the final truss
            return sup.filter(F.col("support") >= k - 2)
        cur, n_edges = kept, n_kept
    raise RuntimeError(
        f"ktruss did not converge within {max_rounds} peel rounds — "
        "raise max_rounds (peel depth exceeds the bound)"
    )
