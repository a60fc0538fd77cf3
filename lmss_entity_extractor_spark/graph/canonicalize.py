"""Triple canonicalization (operator A7) and node-table assembly.

Identical (subj, pred, obj) triples arrive from many turns and many
partitions; hot conversations (2% of convs carry ~100x turns in the
fixture skew profile) make the natural groupBy keys skewed — e.g. the
``turn -> conv`` provenance edge of a hot conversation repeats per turn.

The mandated strategy (BASELINE.json north_rule, SURVEY.md §4 O7) is an
explicit salted aggregation, here staged as three phases:

  phase 0: groupBy(subj, pred, obj, conv_id, turn_idx) — a pure
           HashAggregate (count/max buffers are fixed-width; the
           min-provenance STRUCT of the later phases is not
           hash-aggregable and would force a SortAggregate over the
           full triple stream — measured 1.6x slower end-to-end).
           Collapses all same-turn duplicates map-side first, which is
           where the bulk of repetition lives (a turn with K links
           emits K identical turn->conv edges).
  phase 1: groupBy(subj, pred, obj, salt) — salt derived from the
           provenance columns spreads one hot key over SALT reducers;
           the min-(conv_id, turn_idx) witness is aggregated here, on
           deduplicated rows only,
  phase 2: groupBy(subj, pred, obj) merges the <=SALT partials per key.

Phase-2 cardinality is bounded by distinct-triples x SALT, so no reducer
can receive more than SALT rows for one key — skew is structurally gone,
not just AQE-mitigated (AQE skew handling stays on as a backstop for the
join paths, and coalesces the small phase-1/2 exchanges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def canonicalize_triples(triples: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """triples -> edges(subj, pred, obj, n_provenances, first_conv_id,
    first_turn_idx, max_score); first_* = minimal (conv_id, turn_idx)
    provenance, giving run-independent deterministic output."""
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets)).alias("_salt")
    prov = F.struct(F.col("conv_id"), F.col("turn_idx")).alias("_prov")

    # phase 0: whole-stage-codegen HashAggregate over the full stream
    deduped = (
        triples.groupBy("subj", "pred", "obj", "conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.max("score").alias("_score"))
    )
    # phases 1-2: salted sort-aggregate merge over deduplicated rows only
    partial = (
        deduped.select("subj", "pred", "obj", "_cnt", "_score", salt, prov)
        .groupBy("subj", "pred", "obj", "_salt")
        .agg(
            F.sum("_cnt").alias("_cnt"),
            F.min("_prov").alias("_first"),
            F.max("_score").alias("_score"),
        )
    )
    return (
        partial.groupBy("subj", "pred", "obj")
        .agg(
            F.sum("_cnt").cast("long").alias("n_provenances"),
            F.min("_first").alias("_first"),
            F.max("_score").alias("max_score"),
        )
        .select(
            "subj",
            "pred",
            "obj",
            "n_provenances",
            F.col("_first.conv_id").alias("first_conv_id"),
            F.col("_first.turn_idx").alias("first_turn_idx"),
            F.col("max_score").cast("float").alias("max_score"),
        )
    )


def build_nodes(links: DataFrame, edges: DataFrame, bc_artifacts=None) -> DataFrame:
    """nodes(node_id, node_type, node_label) = mention nodes ∪ class
    nodes ∪ turn nodes ∪ conv nodes, deduplicated (SURVEY.md §2.7).

    Class labels come from the broadcast ontology artifacts (a tiny
    dimension); mention/turn/conv nodes derive from the canonical edges
    so the node set is exactly the set of endpoints in the graph.
    """
    spark = links.sparkSession
    mention_nodes = (
        links.groupBy(F.col("mention_id").alias("node_id"))
        .agg(F.min("text").alias("node_label"))
        .select("node_id", F.lit("mention").alias("node_type"), "node_label")
    )
    subj_ends = edges.select(F.col("subj").alias("node_id"))
    obj_ends = edges.select(F.col("obj").alias("node_id"))
    uri_nodes = (
        subj_ends.union(obj_ends)
        .filter(F.col("node_id").rlike("^(turn|conv)://"))
        .distinct()
        .select(
            "node_id",
            F.regexp_extract("node_id", "^(turn|conv)", 1).alias("node_type"),
            F.col("node_id").alias("node_label"),
        )
    )
    if bc_artifacts is not None:
        arts = bc_artifacts.value
        class_rows = [(iri, "lmss_class", lbl) for iri, lbl in zip(arts.iris, arts.labels)]
        class_nodes_all = spark.createDataFrame(class_rows, schema="node_id string, node_type string, node_label string")
        linked_classes = edges.filter(F.col("pred") == "lmss:isInstanceOf").select(
            F.col("obj").alias("node_id")
        ).distinct()
        class_nodes = class_nodes_all.join(F.broadcast(linked_classes), "node_id", "left_semi")
    else:
        class_nodes = spark.createDataFrame([], schema="node_id string, node_type string, node_label string")

    return mention_nodes.unionByName(uri_nodes).unionByName(class_nodes)
