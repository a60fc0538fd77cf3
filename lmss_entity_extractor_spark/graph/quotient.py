"""Quotient-graph summarization over characteristic sets — the
structural index of SchemEX (Konrath et al., JWS'12) / the summary
graphs of Čebirić et al. (VLDBJ'19 survey §4): collapse every subject
into its characteristic set (the exact SET of predicates it carries,
graph/charsets.py's equivalence) and emit ONE summary edge per
(source class, predicate, target class) with the number of underlying
triples.  A 10^12-edge KG reduces to a few thousand summary edges a
query planner or a human can actually look at; cardinalities feed join
ordering the way charsets feed star-pattern estimates.

Class of a node:

* a node that occurs as a subject -> its sorted distinct-predicate set;
* a node that never occurs as a subject (pure literal / leaf IRI) ->
  the EMPTY set [] — the canonical "no outgoing structure" class, so
  summary edges into leaves stay distinguishable from edges into
  structured entities.

Spark shape: one collect_set aggregation per subject (state bounded by
the DISTINCT predicate count — hub-safe), then two keyed equi-joins
mapping the triple endpoints onto their classes (each triple matches
at most one class row per side — no fan-out), then one combinable
groupBy count.  Three shuffles total, all on natural keys.

No reference counterpart; extends the KG summarization family
(SURVEY §2.11, companion to L60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quotient_graph(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """triples(s, p, o) -> (src_set, p, dst_set, n_triples): the
    characteristic-set quotient graph with per-summary-edge triple
    counts.  src_set/dst_set are sorted arrays of predicate names."""
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    cs = t.groupBy("s").agg(F.sort_array(F.collect_set("p")).alias("cset"))
    src = t.join(cs, "s").select(F.col("cset").alias("src_set"), "p", "o")
    dst_cs = cs.select(F.col("s").alias("o"), F.col("cset").alias("dst_cset"))
    return (
        src.join(dst_cs, "o", "left")
        .select(
            "src_set",
            "p",
            F.coalesce(
                F.col("dst_cset"), F.array().cast("array<string>")
            ).alias("dst_set"),
        )
        .groupBy("src_set", "p", "dst_set")
        .agg(F.count(F.lit(1)).alias("n_triples"))
    )
