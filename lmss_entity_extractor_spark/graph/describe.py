"""SPARQL DESCRIBE via Concise Bounded Description (CBD): given a set
of seed resources, return every triple whose subject is a seed, plus —
recursively — every triple whose subject is a BLANK NODE reached in
object position from an already-included triple (Stickler, CBD W3C
member submission 2005 §2, steps 1-2; the reification step is
deliberately out of scope and documented, matching what mainstream
stores ship as their DESCRIBE default).

Spark-first shape — a frontier walk, exactly the machinery of
``graph/rdflist.py``/``closure.py``:

- the frontier starts as the distinct seed set and each round becomes
  the NEW blank nodes discovered in object position (one equi-join
  against the triple table + one anti-join against the visited set);
- each round's triples are one hash join (frontier is typically tiny →
  broadcast; AQE decides), and rounds run to frontier exhaustion —
  depth = longest blank-node chain, which in real RDF is the depth of
  structured values (addresses, lists): single digits;
- ``localCheckpoint`` flattens the visited/frontier lineage each round
  so the plan does not grow with depth;
- a LOUD RuntimeError after ``max_rounds`` rather than a silent
  truncation — a blank-node cycle (legal RDF, degenerate data) must
  surface, not hang or under-describe.

The visited set makes each node's out-triples land exactly once, so the
output is duplicate-free without a final distinct (the triple table is
a set; each subject joins from one frontier round only).

Determinism: the result is a set-valued fixpoint — independent of join
order, round batching, and parallelism — which is what makes it
SQL-oracle-checkable (recursive CTE over the same reachability rule).

Reference counterpart: none — the reference's JSON export
(`app/lmss_ontology.py`) inlines fixed fields; resource description as
a query surface is part of the beyond-reference KG mandate (SURVEY
§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def describe_cbd(
    triples: DataFrame,
    seeds: DataFrame,
    *,
    node_col: str = "node",
    bnode_prefix: str = "_:",
    max_rounds: int = 32,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Return the CBD of ``seeds`` (a DataFrame with ``node_col``) over
    ``triples`` as (s, p, o) rows.  Blank nodes are recognized by
    ``bnode_prefix`` on the object term."""
    g = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    frontier = (
        seeds.select(F.col(node_col).alias("node")).distinct().localCheckpoint()
    )
    visited = frontier
    out: DataFrame | None = None
    for _ in range(max_rounds):
        batch = g.join(frontier, on=g["s"] == frontier["node"], how="inner").select(
            "s", "p", "o"
        )
        out = batch if out is None else out.unionByName(batch)
        nxt = (
            batch.filter(F.col("o").startswith(bnode_prefix))
            .select(F.col("o").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            return out
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"describe_cbd did not exhaust its frontier within {max_rounds} "
        "rounds — blank-node chain deeper than the bound (or cyclic); "
        "raise max_rounds"
    )
