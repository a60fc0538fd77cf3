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
chain.

For general graphs with long chains (e.g. edge lists at PageRank scale),
``connected_components_star`` implements the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): round count is O(log^2 n) worst-case and ~log d in
practice instead of d, at the cost of two keyed shuffles per round.
Both variants sit behind the same signature; ``algorithm=`` selects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int | None = None,
    algorithm: str = "propagation",
) -> DataFrame:
    """edges(src, dst) -> (node, component), component = min node id of
    the node's component (ids compared with their natural ordering; works
    for numeric and string ids).  Nodes appear iff they touch an edge.

    ``algorithm="propagation"`` (default) converges in diameter rounds —
    right for near-clique dup groups; ``algorithm="star"`` runs
    large-star/small-star (~log d rounds) — right for long-chain graphs.
    ``max_iter=None`` uses each algorithm's own default (25 / 30).
    """
    if algorithm == "star":
        if max_iter is None:
            return connected_components_star(edges, src, dst)
        return connected_components_star(edges, src, dst, max_iter=max_iter)
    if algorithm != "propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}: propagation | star")
    if max_iter is None:
        max_iter = 25
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
        stepped = labels.join(neigh_min, "node", "left").select(
            "node",
            F.least(F.col("component"), F.col("_nmin")).alias("component"),
            F.col("component").alias("_prev"),
        )
        # path halving (pointer jumping): also adopt the label OF the
        # label node — label(v) is always a node id inside v's component
        # and labels only ever decrease, so the fixpoint (every label =
        # component minimum) is unchanged while long chains now collapse
        # in O(log diameter) rounds instead of diameter rounds (a 21-hop
        # chain in the sf1.0 near-dup graph took 22 rounds of pure
        # propagation at ~0.4s of fixed per-round cost each)
        merged = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("component"), F.col("component").alias("_jmp")
                ),
                "component",
                "left",
            )
            .select(
                "node",
                F.least(F.col("component"), F.col("_jmp")).alias("component"),
                (F.least(F.col("component"), F.col("_jmp")) != F.col("_prev")).alias("_chg"),
            )
            # lazy checkpoint + full count = ONE job per round doing both
            # the change detection and the checkpoint materialization
            # (count computes every partition, so the checkpoint is
            # complete); the eager-checkpoint + limit(1).count form ran
            # two jobs per round for the same answer — measured 24%
            # slower over the sf1.0 iteration section, labels identical
            .localCheckpoint(eager=False)
        )
        changed = merged.filter(F.col("_chg")).count()
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14) — same contract as ``connected_components`` but converges in
    ~log(diameter) rounds, so a 1M-hop chain costs ~20 rounds, not 1M.

    One round = two keyed shuffles over the (shrinking) edge set:

    * large-star: every node u hooks its LARGER neighbors onto
      min(N(u) ∪ {u}) — breaks long chains in half;
    * small-star: every node u (edges oriented big->small) hooks its
      smaller neighbors and itself onto min(N(u)) — flattens into stars.

    At fixpoint the edge set is a star forest (every node points at its
    component minimum), which reads off as the label table directly.
    Edges are kept canonically oriented u > v throughout so the
    fixpoint test is plain set equality.  ``stats["rounds"]`` reports
    rounds used (tests pin the O(log d) claim with it)."""
    raw = edges.select(F.col(src).alias("n1"), F.col(dst).alias("n2"))
    all_nodes = (
        raw.select(F.col("n1").alias("node"))
        .union(raw.select(F.col("n2").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        raw.filter(F.col("n1") != F.col("n2"))
        .select(
            F.greatest("n1", "n2").alias("u"),
            F.least("n1", "n2").alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    prev_n = e.count()
    converged = prev_n == 0
    while not converged and rounds < max_iter:
        rounds += 1
        # large-star: group the SYMMETRIC neighborhood by u, hook bigger
        # neighbors onto the neighborhood minimum (output already u > v)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: edges already point big->small; hook u and all its
        # smaller neighbors onto the minimum neighbor
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smin, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                    )
                ).alias("p")
            )
            .select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # set equality in two actions, not three: both sides are distinct,
        # so equal counts (prev count carried locally, not recomputed) +
        # one-direction empty difference imply equality
        n = small.count()
        converged = n == prev_n and small.exceptAll(e).isEmpty()
        prev_n = n
        e = small
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within {max_iter} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # star forest: (u, root) edges; roots — and nodes that only touched
    # self-loops (dropped by the u != v filter but contractually present,
    # matching the propagation variant) — label themselves
    labeled = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    self_labeled = (
        all_nodes.join(labeled.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return labeled.union(self_labeled)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    algorithm: str = "propagation",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, canonical_id): transitive closure of
    the pair relation with the minimum member as the cluster canonical.
    Docs with no near-dup pair are absent (they are their own canonical).
    """
    cc = connected_components(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        algorithm=algorithm,
    )
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_id"))
