"""Leakage-safe train/validation splitting (L43): assign every document
to a side by the KNUTH HASH OF ITS NEAR-DUP CLUSTER CANONICAL, so a
cluster of near-duplicates can never straddle the split — the
train/test-contamination failure mode (a val doc whose near-twin sits in
train) is excluded by construction, not by post-hoc filtering.

This is the split discipline the dedup literature implies (Lee et al.
2021 §6 measure exactly this leakage; SemDeDup and decontamination both
exist to prevent it): the unit of assignment must be the equivalence
class under near-duplication, not the document.

Scale shape (100 TB):
  * the cluster map comes from :func:`ops.components.dedup_clusters`
    (only docs that HAVE a near-dup pair appear — typically a small
    fraction of the corpus) — one keyed equi-join attaches it, AQE may
    broadcast it when small;
  * the side decision is the shared cross-engine
    :func:`ops.textprep.knuth_hash` — pure integer arithmetic, exactly
    reproducible in ANSI SQL, append-stable (new docs never flip
    existing assignments) and parallelism-independent;
  * no shuffle beyond the one join: the hash is a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import dedup_clusters
from .textprep import knuth_hash


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_per_mille: int = 100,
    modulus: int = 1000,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """All of ``docs``'s columns plus (split_key, split): ``split_key``
    is the doc's cluster canonical (its own id when it has no near-dup
    pair), ``split`` is 'val' when
    ``knuth_hash(split_key) % modulus < val_per_mille`` else 'train'.

    Invariant: rows sharing a near-dup cluster share ``split_key`` and
    therefore ``split`` — a near-duplicate of a val doc cannot land in
    train.  ``pairs`` is any symmetric near-dup pair relation
    ((doc_a, doc_b) — MinHash/SimHash/embedding, the ops/dedup.py
    generators all qualify)."""
    if not 0 <= val_per_mille <= modulus:
        raise ValueError("val_per_mille must be within [0, modulus]")
    clusters = dedup_clusters(pairs, id_a=id_a, id_b=id_b).withColumnRenamed(
        "doc_id", id_col
    )
    return (
        docs.join(clusters, id_col, "left")
        .withColumn("split_key", F.coalesce(F.col("canonical_id"), F.col(id_col)))
        .drop("canonical_id")
        .withColumn(
            "split",
            F.when(
                F.pmod(knuth_hash("split_key"), F.lit(modulus)) < F.lit(val_per_mille),
                F.lit("val"),
            ).otherwise(F.lit("train")),
        )
    )
