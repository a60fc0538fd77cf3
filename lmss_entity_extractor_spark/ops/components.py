"""Connected components over an edge list, and near-dup cluster
resolution on top of the dedup pair generators.

The dedup family (ops/dedup.py) emits candidate PAIRS; a training-data
pipeline needs CLUSTERS — "these 5 documents are one logical document,
keep the canonical one".  Pairs -> clusters is connected components,
computed here as iterative min-label propagation:

  label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each iteration is one keyed shuffle (join labels
onto the edge list + min-aggregate), and the iterate is
``localCheckpoint``-ed like graph/closure.py so the lineage stays flat.
Iterations needed = graph diameter, which for near-dup clusters is tiny
(dup groups are near-cliques); ``max_iter`` guards the pathological
chain.  This is the simple propagation variant; the large-star/small-star
optimization (Kiveris et al., "Connected Components in MapReduce") drops
in behind the same signature if diameters ever grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (node, component), component = min node id of
    the node's component (ids compared with their natural ordering; works
    for numeric and string ids).  Nodes appear iff they touch an edge.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    changed = 1
    for _ in range(max_iter):
        # neighbor minimum in one keyed aggregate, then merge with own label
        neigh_min = (
            und.join(labels, und["a"] == labels["node"])
            .select(F.col("b").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("_nmin"))
        )
        merged = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.col("_nmin")).alias("component"),
                (F.least(F.col("component"), F.col("_nmin")) != F.col("component")).alias("_chg"),
            )
            .localCheckpoint()  # flatten lineage; also materializes for the action below
        )
        changed = merged.filter(F.col("_chg")).limit(1).count()
        labels = merged.drop("_chg")
        if changed == 0:
            break
    if changed != 0:
        # silent partial convergence would split one logical cluster into
        # several canonical ids downstream — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} iterations "
            "(component diameter exceeds the budget); raise max_iter or switch "
            "to the large-star/small-star variant for long-chain graphs"
        )
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs -> (doc_id, canonical_id): transitive closure of
    the pair relation with the minimum member as the cluster canonical.
    Docs with no near-dup pair are absent (they are their own canonical).
    """
    cc = connected_components(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    )
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_id"))
