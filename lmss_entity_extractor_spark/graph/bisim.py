"""k-bisimulation equivalence classes — structural partition refinement
(Schätzle, Neu, Lausen & Przyjaciel-Zablocki, GRADES'13 distributed
bisimulation; Kaushik et al. ICDE'02 A(k)-index): two nodes are
k-bisimilar iff their outgoing (predicate, class of neighbor) signatures
agree at every refinement depth ≤ k.  This is the full-strength version
of the characteristic-set quotient (graph/quotient.py = depth-1
predicates-only): the A(k) partition is what structural indexes and
cardinality models use when predicate sets alone can't separate shapes.

Class ids are CONTENT-ADDRESSED: class_i(n) = md5 over the sorted
distinct set of "p<US>class_{i-1}(o)" strings (record-separated), with
class_0 shared by every node.  Hashing the canonical serialization
makes ids parallelism-independent and lets a SQL oracle re-derive every
id byte-for-byte — the graph/reify.py minting discipline.  (Collisions:
md5 over ≤10^12 signatures is 2^-64-ish territory, the same budget the
repo's 64-bit LSH keys already accept — documented, not hidden.)

Spark shape per round: one equi-join carrying classes onto the triple
objects (keyed by o), one collect_set aggregation per subject (state
bounded by out-degree × distinct neighbor classes — the charsets.py
hub argument), one left join back onto the node set so sinks keep the
empty-signature class; lineage flattened with ``localCheckpoint``.
k is a FIXED depth (A(k) semantics, no convergence argument needed) —
exactly like the L68 hop bound.

No reference counterpart; extends the KG summarization family
(SURVEY §2.11, companion to L60/L66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = "\x1f"  # unit separator inside one (p, class) record
_RS = "\x1e"  # record separator between sorted records


def bisimulation_classes(
    triples: DataFrame,
    k: int = 2,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """triples(s, p, o) -> (node, cls): the A(k) forward-bisimulation
    class of every node (subjects and objects), as an md5 hex id."""
    if k < 0:
        raise ValueError("k must be >= 0")
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).localCheckpoint(eager=True)
    nodes = (
        t.select(F.col("s").alias("node"))
        .union(t.select("o"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    classes = nodes.select("node", F.md5(F.lit("")).alias("cls"))
    for _ in range(k):
        sigs = (
            t.join(classes, t["o"] == classes["node"])
            .select("s", F.concat_ws(_US, "p", "cls").alias("rec"))
            .groupBy("s")
            .agg(
                F.md5(
                    F.concat_ws(_RS, F.sort_array(F.collect_set("rec")))
                ).alias("cls")
            )
        )
        classes = (
            nodes.join(sigs, nodes["node"] == sigs["s"], "left")
            .select(
                "node",
                F.coalesce(F.col("cls"), F.md5(F.lit(""))).alias("cls"),
            )
            .localCheckpoint(eager=True)
        )
    return classes
