"""Topological levels of a DAG: level(n) = length of the LONGEST path
from any source (in-degree-0 node) to n — the stage-scheduling /
hierarchy-leveling primitive (ontology depth tiers, dependency wave
scheduling, dataflow stage assignment).  Nodes in the same level are
mutually independent, so a consumer can process the graph level by
level with full parallelism inside each wave.

Algorithm: synchronous Bellman-Ford-style MAX propagation —
level₀(n) = 0 for sources; each round relaxes
level(n) = max(level(n), level(pred) + 1) with one equi-join + one
map-side-combinable max.  Rounds = longest path length (the DAG's
height, single digits for ontologies); ``localCheckpoint`` per round
(closure.py discipline) and a LOUD RuntimeError past ``max_rounds`` —
on a cyclic input the relaxation never stabilizes, so the bound IS the
cycle detector (pair with graph/scc.py to locate the offending ring).

Fixpoint ⇒ round-count-independent ⇒ value-oracle-checkable: the
oracle recomputes the same longest-path max with a recursive CTE over
all root-to-node paths (path COUNT can be exponential in pathological
DAGs — the oracle is a small-fixture instrument; the operator itself
only ever materializes one row per node per round).

Reference counterpart: none — the reference's branch map walks parents
per node in Python (`app/lmss_ontology.py`); set-at-a-time leveling is
part of the beyond-reference KG mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dag_levels(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """edges(src, dst) = directed src → dst.  Returns (node, level) for
    every node of the edge set: 0 for sources (no incoming edge),
    else 1 + max over predecessors.  RuntimeError on cycles (the
    relaxation cannot stabilize within ``max_rounds``)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e = e.localCheckpoint()
    nodes = e.select(F.col("u").alias("node")).union(
        e.select(F.col("v"))
    ).distinct()
    lvl = nodes.select("node", F.lit(0).alias("level")).localCheckpoint()
    for _ in range(max_rounds):
        relaxed = (
            e.join(lvl.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), (F.col("level") + 1).alias("level"))
            .unionByName(lvl)
            .groupBy("node")
            .agg(F.max("level").alias("level"))
            .localCheckpoint()
        )
        # stable iff no node's level rose this round
        changed = (
            relaxed.join(lvl.withColumnRenamed("level", "_old"), "node")
            .filter(F.col("level") != F.col("_old"))
            .limit(1)
            .count()
        )
        lvl = relaxed
        if changed == 0:
            return lvl
    raise RuntimeError(
        f"dag_levels did not stabilize within {max_rounds} rounds — the "
        "graph has a cycle (use graph/scc.py strongly_connected to find "
        "it) or a path longer than the bound"
    )


def critical_path(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    scale: int = 2,
    max_rounds: int = 50,
) -> DataFrame:
    """Weighted critical path / CPM early start (L411): ``(node, es,
    critical_len)`` — the WEIGHTED sibling of L99's dag_levels
    (level = hop count; es = longest WEIGHTED path from any source),
    the project-/pipeline-scheduling primitive: es(n) is the earliest
    time task n can start when every edge carries its predecessor's
    duration, and ``critical_len`` (the global max, repeated per row)
    is the whole schedule's length — the critical-path bound.

    Same synchronous max-relaxation as L99 (one equi-join + one
    combinable max per round, localCheckpoint, LOUD non-convergence =
    the cycle detector), but the relaxed quantity is an EXACT
    DECIMAL(18, scale) sum of durations — max over exact decimals is
    ORDER-FREE, so the fixpoint is bit-identical and ungridded.
    Negative durations are REFUSED (CPM durations; max-relaxation
    semantics would silently become shortest-path-ish).

    No reference counterpart; scheduling analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    e = (
        edges.filter(
            F.col(src).isNotNull()
            & F.col(dst).isNotNull()
            & F.col(weight).isNotNull()
        )
        .select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast(dec).alias("w"),
        )
        .localCheckpoint()
    )
    n_neg = e.filter(F.col("w") < 0).count()
    if n_neg:
        raise ValueError(
            f"critical_path: {n_neg} negative duration(s) — CPM "
            "early-start is defined for non-negative durations"
        )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v")))
        .distinct()
    )
    es = nodes.select(
        "node", F.lit(0).cast(dec).alias("es")
    ).localCheckpoint()
    for _ in range(max_rounds):
        relaxed = (
            e.join(es.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                (F.col("es") + F.col("w")).cast(dec).alias("es"),
            )
            .unionByName(es)
            .groupBy("node")
            .agg(F.max("es").alias("es"))
            .localCheckpoint()
        )
        changed = (
            relaxed.join(es.withColumnRenamed("es", "_old"), "node")
            .filter(F.col("es") != F.col("_old"))
            .limit(1)
            .count()
        )
        es = relaxed
        if changed == 0:
            top = es.agg(F.max("es").alias("critical_len"))
            return es.crossJoin(F.broadcast(top))
    raise RuntimeError(
        f"critical_path did not stabilize within {max_rounds} rounds "
        "— the graph has a cycle or a path longer than the bound"
    )
