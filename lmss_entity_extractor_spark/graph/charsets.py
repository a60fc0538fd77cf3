"""Characteristic sets (Neumann & Moerkotte, ICDE'11): group subjects
by the exact SET of predicates they carry and count subjects and
triples per set — the structural summary an RDF engine keeps for
cardinality estimation (star-join selectivity), and, at bulk-load
time, the profile that tells you what "entity shapes" a scraped 100 TB
graph actually contains before you write shapes (graph/shacl.py) for
it.

Output, one row per distinct predicate set:

    (predicates: array<string>, sorted — the set identity,
     n_subjects: bigint — subjects carrying exactly this set,
     n_triples:  bigint — triples those subjects carry)

Spark-first shape: a combinable (s, p) count, then ONE groupBy(s)
building the sorted distinct predicate array (per-subject state is
bounded by the subject's distinct PREDICATE count, never its triple
count — a 10^6-triple hub subject with 5 predicates costs 5 entries),
then ONE groupBy on the array.  Three keyed shuffles, all on natural
keys; nothing driver-side.

No reference counterpart; extends the KG analytics family
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def characteristic_sets(
    triples: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
) -> DataFrame:
    """Compute the characteristic-set summary of ``triples``."""
    sp = (
        triples.select(F.col(s_col).alias("s"), F.col(p_col).alias("p"))
        .groupBy("s", "p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_subject = sp.groupBy("s").agg(
        F.array_sort(F.collect_list("p")).alias("predicates"),
        F.sum("n").alias("_nt"),
    )
    return per_subject.groupBy("predicates").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("_nt").alias("n_triples"),
    )
