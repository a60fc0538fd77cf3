"""Synchronous label-propagation community detection (Raghavan et al.,
Phys. Rev. E 2007): each node repeatedly adopts the most frequent label
among its neighbors — the near-linear-time community detector a KG runs
to group densely connected entities (finer-grained than connected
components, which merge everything reachable).

Determinism (the part naive LPA lacks): SYNCHRONOUS updates from a
fixed initial labeling (label = node id) with a TOTAL tie-break
(highest count, then smallest label), run for a FIXED number of
iterations.  No RNG, no visit order, no asynchronous races — rerun,
repartition, or re-derive on another engine and the labels are
identical (the oracle unrolls the same recurrence, one CTE per
iteration, exactly like graph/pagerank.py's contract).  Fixed
iterations rather than convergence detection is also the honest
choice for sync LPA, which can 2-cycle on bipartite-ish structure;
``iterations`` is the caller's budget knob.

Scale shape per iteration: one keyed join (neighbor labels), one
combinable groupBy count, one per-node window argmax — three keyed
shuffles on node id, nothing quadratic; lineage flattened per round
with localCheckpoint like every iterative operator here.

No reference counterpart; extends the graph analytics family
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """edges(src, dst), treated as undirected → (node, label) after
    ``iterations`` synchronous rounds.  Nodes appear iff they touch an
    edge (isolated nodes keep their own label trivially and are not
    the detector's business).  Self-loops are dropped — a node is not
    its own neighbor."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        neigh = und.join(labels, und["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        counts = neigh.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels
