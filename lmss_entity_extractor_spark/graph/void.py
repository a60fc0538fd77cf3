"""VoID dataset statistics (W3C "Describing Linked Datasets with the
VoID Vocabulary", 2011 §3) — the publishing profile a KG pipeline emits
alongside the graph tables: dataset-level triple/term counts, per-
predicate property partitions, and per-class partitions.  At 10^12
turns these numbers are what a consumer reads BEFORE deciding to scan
anything.

Spark shape — every statistic is a map-side-combinable aggregate:

* property partitions: Spark plans ``countDistinct`` inside a grouped
  aggregate as a two-phase rewrite — partial distinct on (p, term)
  first (shuffle keyed by BOTH columns, so a hot predicate like
  rdf:type spreads across reducers), then the per-p counts; no
  single-reducer funnel on skewed predicates;
* class partitions: one filter (pushed to the scan) + one distinct +
  one count — entities typed twice count once per class;
* the dataset summary is four independent 1-row aggregates unioned —
  each distinct-count shuffles on the value itself (never on a
  constant), then reduces to a single row.

No reference counterpart (the reference emits a JSON index, not a
dataset description); extends the KG publishing family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def void_property_partitions(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """One row per predicate: (p, n_triples, n_subjects, n_objects) —
    VoID's propertyPartition with void:triples / distinctSubjects /
    distinctObjects."""
    return triples.groupBy(F.col(p_col).alias("p")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct(s_col).alias("n_subjects"),
        F.countDistinct(o_col).alias("n_objects"),
    )


def void_class_partitions(
    triples: DataFrame,
    type_pred: str = "rdf:type",
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """One row per class: (cls, n_entities) — VoID's classPartition
    with void:entities, counting each typed entity once per class."""
    return (
        triples.filter(F.col(p_col) == type_pred)
        .select(F.col(o_col).alias("cls"), F.col(s_col).alias("s"))
        .distinct()
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )


def void_summary(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """A single row: (n_triples, n_subjects, n_predicates, n_objects,
    n_terms) — the dataset-level VoID statistics, n_terms over the
    union of the three positions (the dictionary size a loader like
    graph/dictenc.py would build)."""
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    terms = (
        t.select(F.col("s").alias("term"))
        .union(t.select("p"))
        .union(t.select("o"))
    )
    return (
        t.agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("s").alias("n_subjects"),
            F.countDistinct("p").alias("n_predicates"),
            F.countDistinct("o").alias("n_objects"),
        )
        .crossJoin(
            F.broadcast(terms.agg(F.countDistinct("term").alias("n_terms")))
        )
    )
