"""Incremental transitive-closure maintenance under edge INSERTS —
semi-naive delta evaluation (Gupta, Mumick & Subrahmanian SIGMOD'93;
the DRed insert half): given the materialized closure C of an edge set
E and a batch of new edges ΔE, produce the closure of E ∪ ΔE WITHOUT
re-joining C with itself.  At 10^12 turns the ontology/provenance
closure is petabyte-class; re-deriving it because 0.01% of edges
arrived today is exactly the recompute a maintenance operator exists
to avoid.

Shape of the delta loop — C is never shuffled inside the loop:

* every new path uses ≥1 frontier pair, so each round joins the SMALL
  frontier against the accumulator from both sides (frontier-first and
  frontier-last); with a small ΔE both joins broadcast the frontier and
  leave the big side map-local;
* the accumulator collects rows WITHOUT per-round dedup (a superseded
  depth is harmless mid-loop — candidates derived from it are never
  smaller than truth); the single full shuffle is ONE min-groupBy at
  the end;
* the frontier keeps only STRICT depth improvements vs the
  accumulator's current best (checked by a frontier-sized aggregate,
  not an accumulator-wide one), so the loop terminates at the true
  min-depth fixpoint — Bellman-Ford-style relaxation, LOUD failure
  past ``max_rounds`` (the components.py non-convergence discipline).

Contract: input closure in ``transitive_closure(include_self=False)``
form (desc_iri, anc_iri, min depth); output identical to recomputing
``transitive_closure(E ∪ ΔE, include_self=False)`` from scratch —
pinned by test and by the `closure_insert` recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _improving(cand: DataFrame, acc: DataFrame) -> DataFrame:
    """Rows of cand (unique per pair) strictly better than acc's
    current best depth for the same pair; aggregate sized by |cand|."""
    j = cand.join(
        acc.select("desc_iri", "anc_iri", F.col("depth").alias("_old")),
        ["desc_iri", "anc_iri"],
        "left",
    )
    best = j.groupBy("desc_iri", "anc_iri", "depth").agg(
        F.min("_old").alias("_best_old")
    )
    return best.filter(
        F.col("_best_old").isNull() | (F.col("depth") < F.col("_best_old"))
    ).select("desc_iri", "anc_iri", "depth")


def closure_insert(
    closure: DataFrame,
    new_edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_rounds: int = 30,
) -> DataFrame:
    """closure(desc_iri, anc_iri, depth) + new_edges(child, parent) ->
    the closure of the union, (desc_iri, anc_iri, depth) at min depth.
    New edges may shorten existing pairs; those depths update too."""
    spark = closure.sparkSession
    # same Spark 4.1 constraint-rewrite guard as graph/closure.py:43 —
    # this loop also unions checkpointed legs
    _CP = "spark.sql.constraintPropagation.enabled"
    prev_cp = spark.conf.get(_CP, "true")
    spark.conf.set(_CP, "false")
    try:
        return _insert_loop(closure, new_edges, child_col, parent_col, max_rounds)
    finally:
        spark.conf.set(_CP, prev_cp)


def _insert_loop(
    closure: DataFrame,
    new_edges: DataFrame,
    child_col: str,
    parent_col: str,
    max_rounds: int,
) -> DataFrame:
    delta = (
        new_edges.select(
            F.col(child_col).alias("desc_iri"),
            F.col(parent_col).alias("anc_iri"),
            F.lit(1).alias("depth"),
        )
        .filter(F.col("desc_iri").isNotNull() & F.col("anc_iri").isNotNull())
        .distinct()
    )
    acc = closure.select(
        "desc_iri", "anc_iri", F.col("depth").cast("int").alias("depth")
    ).localCheckpoint(eager=True)
    # lazy checkpoint: the emptiness count below computes every
    # partition, materializing the checkpoint in the same job (r6)
    frontier = _improving(delta, acc).localCheckpoint(eager=False)

    for _ in range(max_rounds):
        if frontier.count() == 0:
            return (
                acc.groupBy("desc_iri", "anc_iri")
                .agg(F.min("depth").cast("int").alias("depth"))
            )
        acc = acc.unionByName(frontier).localCheckpoint(eager=True)
        fwd = (
            frontier.alias("f")
            .join(acc.alias("a"), F.col("f.anc_iri") == F.col("a.desc_iri"))
            .select(
                F.col("f.desc_iri").alias("desc_iri"),
                F.col("a.anc_iri").alias("anc_iri"),
                (F.col("f.depth") + F.col("a.depth")).alias("depth"),
            )
        )
        bwd = (
            acc.alias("a")
            .join(frontier.alias("f"), F.col("a.anc_iri") == F.col("f.desc_iri"))
            .select(
                F.col("a.desc_iri").alias("desc_iri"),
                F.col("f.anc_iri").alias("anc_iri"),
                (F.col("a.depth") + F.col("f.depth")).alias("depth"),
            )
        )
        cand = (
            fwd.unionByName(bwd)
            .groupBy("desc_iri", "anc_iri")
            .agg(F.min("depth").alias("depth"))
        )
        frontier = _improving(cand, acc).localCheckpoint(eager=False)

    raise RuntimeError(
        f"closure_insert did not converge within {max_rounds} rounds — "
        "raise max_rounds (delta reach exceeds the bound)"
    )
