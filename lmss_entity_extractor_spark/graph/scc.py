"""Strongly connected components of a DIRECTED graph — the cycle
detector of KG hygiene (a subClassOf/partOf hierarchy must be a DAG;
any SCC larger than a single node is a modeling error worth surfacing,
and sameAs-style equivalence rings show up as exactly these cycles).

Definition-as-relation, Spark-first: u and v share a component iff
u →* v AND v →* u, so with R = reflexive transitive closure,

    scc(u) = MIN{ v : (u, v) ∈ R and (v, u) ∈ R }

— one self-join of the closure on the swapped pair plus ONE
map-side-combinable min aggregate.  The closure comes from
``graph/closure.py`` (iterative fixpoint, localCheckpoint per round,
loud iteration bound), so SCC inherits its cost profile: rounds =
graph diameter, and the closure relation is the size bound.  That
makes this the HIERARCHY-SCALE variant (ontologies, schema graphs,
equivalence rings — exactly where SCC questions arise in a KG
pipeline), not a web-graph SCC: R on a 10^12-edge social graph is
quadratic and a Tarjan-style forward-backward decomposition would be
the right tool there (documented trade, same stance as the
brute-force-vs-IVF kNN split).

Deterministic by construction: MIN over an id domain — no iteration
order, no tie-break freedom; and therefore value-oracle-checkable
(recursive CTE + the same min rule).

Reference counterpart: none — the reference assumes its ontology is
acyclic (`app/lmss_ontology.py` walks parents without cycle checks);
surfacing the violation is part of the beyond-reference KG-quality
mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import transitive_closure


def strongly_connected(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """edges(src, dst) -> (node, component) where component is the
    smallest node id mutually reachable with ``node``.  Every node of
    the edge set appears exactly once; a node outside any cycle is its
    own singleton component."""
    e = edges.select(F.col(src).alias("child"), F.col(dst).alias("parent"))
    reach = (
        transitive_closure(
            e, "child", "parent", include_self=True, max_iterations=max_iterations
        )
        .select(F.col("desc_iri").alias("u"), F.col("anc_iri").alias("v"))
        .distinct()
    )
    back = reach.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = reach.join(back, ["u", "v"])
    return mutual.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
