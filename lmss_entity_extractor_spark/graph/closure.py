"""Transitive closure over an edge DataFrame — operator J4.

The reference computes subclass reachability by Python recursion per
query (/root/reference/app/lmss_search.py:54-59,
/root/reference/app/lmss_parser.py:106-112,
/root/reference/app/lmss_classification.py:163-165) — repeated traversals
of an in-memory graph.  The Spark-native form is a fixpoint of iterative
self-joins, materialized ONCE and reused (SURVEY.md §4 O6): each round
extends frontier paths by one edge, ``localCheckpoint`` truncates the
exponentially growing lineage, and iteration stops when a round adds no
new (desc, anc) pair.  Ontology hierarchies are shallow (depth <= ~10),
so the loop runs a handful of rounds.

For the small ontology dimension the driver-side BFS in
``ontology/artifacts.py`` produces the same table; this operator is the
scale path for *generic* edge sets (provenance graphs, class hierarchies
of 10^6+ nodes) and is property-tested against the BFS closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    include_self: bool = True,
    max_iterations: int = 30,
) -> DataFrame:
    """Closure of (child -> parent) edges: (desc_iri, anc_iri, depth).

    ``include_self`` adds (x, x, 0) rows for every node, matching the
    reference's ``transitive_objects`` which yields the subject itself
    first (/root/reference/app/lmss_classification.py:163-165).
    """
    spark = edges.sparkSession
    # Spark 4.1 hits a constraint-rewrite NoSuchElementException when
    # checkpointing a Union over LogicalRDD (checkpointed) legs; constraint
    # propagation adds nothing to this loop, so disable it for its scope.
    _CP = "spark.sql.constraintPropagation.enabled"
    prev_cp = spark.conf.get(_CP, "true")
    spark.conf.set(_CP, "false")
    try:
        return _closure_loop(edges, child_col, parent_col, include_self, max_iterations)
    finally:
        spark.conf.set(_CP, prev_cp)


def _closure_loop(
    edges: DataFrame,
    child_col: str,
    parent_col: str,
    include_self: bool,
    max_iterations: int,
) -> DataFrame:
    base = (
        edges.select(
            F.col(child_col).alias("desc_iri"),
            F.col(parent_col).alias("anc_iri"),
            F.lit(1).alias("depth"),
        )
        .filter(F.col("desc_iri").isNotNull() & F.col("anc_iri").isNotNull())
        .distinct()
    )

    closure = base.localCheckpoint(eager=True)
    frontier = closure
    known = closure.count()

    for _ in range(max_iterations):
        # extend each frontier path by one parent edge
        extended = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.anc_iri") == F.col("e.desc_iri"))
            .select(
                F.col("f.desc_iri").alias("desc_iri"),
                F.col("e.anc_iri").alias("anc_iri"),
                (F.col("f.depth") + F.col("e.depth")).alias("depth"),
            )
        )
        # keep only genuinely new pairs, at their minimal depth
        new_pairs = (
            extended.join(closure, ["desc_iri", "anc_iri"], "left_anti")
            .groupBy("desc_iri", "anc_iri")
            .agg(F.min("depth").alias("depth"))
            # lazy checkpoint: the count below computes every partition,
            # materializing the checkpoint in the SAME job (r6 — the
            # eager+count form ran two jobs per round for the same answer)
            .localCheckpoint(eager=False)
        )
        n_new = new_pairs.count()
        if n_new == 0:
            break
        closure = closure.unionByName(new_pairs).localCheckpoint(eager=True)
        frontier = new_pairs
        known += n_new

    if include_self:
        nodes = (
            base.select(F.col("desc_iri").alias("n"))
            .union(base.select(F.col("anc_iri")))
            .distinct()
        )
        self_rows = nodes.select(
            F.col("n").alias("desc_iri"), F.col("n").alias("anc_iri"), F.lit(0).alias("depth")
        )
        # cyclic inputs (or literal self-loop edges) discover (x, x, d>0)
        # rows in the loop; with include_self the depth-0 row is THE
        # representation of self-reachability (one row per pair, like the
        # reference's transitive_objects yielding the subject first) —
        # keep exactly one, not one per discovery depth
        closure = closure.filter(F.col("desc_iri") != F.col("anc_iri")).unionByName(self_rows)

    # final checkpoint: callers act on this plan after the constraint-
    # propagation conf is restored, so hand back a clean LogicalRDD root.
    return closure.select(
        "desc_iri", "anc_iri", F.col("depth").cast("int").alias("depth")
    ).localCheckpoint(eager=True)
