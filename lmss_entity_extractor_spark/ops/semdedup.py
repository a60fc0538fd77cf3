"""Semantic deduplication (L40): SemDeDup (Abbas et al. 2023) — find
and drop semantically near-duplicate items by (1) coarse-clustering the
embedding space with the deterministic spherical-k-means quantizer,
(2) comparing pairs only WITHIN a cluster, and (3) keeping, from every
near-duplicate pair, the item with the LOWER cosine similarity to its
cluster centroid (the paper's "keep the least prototypical" rule —
duplicates close to the centroid carry the least extra information).

Reference scope: the reference app has no corpus curation at all;
semantic dedup is part of the training-data-curation surface SURVEY
§2.11 mandates for the 100 TB corpus path.  It composes the existing
IVF machinery (`ops/similarity.py`): training, literal-expression cell
assignment, and the sequential-fold cosine.

Decision rule (deterministic, pairwise — no connected components
needed): item ``j`` is DROPPED iff some ``i`` in the same cell has
``cos(i, j) >= threshold`` and ``i`` precedes ``j`` in the keep order
``(centroid_sim ASC, id ASC)``.  Equivalently: within every near-dup
pair the more-prototypical member is dropped; among exact ties the
larger id is dropped.  The rule needs only pair tests, is independent
of evaluation order, and is reproducible in ANSI SQL — the oracle
(``__spark_entry__._semdedup_oracle_sql``) re-derives cells,
centroid similarities (bit-for-bit: every float comes from the same
left-associated fold), and the drop set.

Scale shape: cell assignment is a narrow literal-expression projection
(zero shuffle, `ivf_cell_expr`); the quadratic pair scan is confined to
single cells — exactly SemDeDup's design: `n_centroids` grows with the
corpus (the paper uses ~100k clusters) so per-cell cost stays bounded;
training cost is bounded by `sample_mod` hash sampling.  One equi-join
shuffle on `cell`, one distinct on the dropped ids, one id join to
attach flags.  Nothing corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.similarity import (
    _ivf_struct_entries_sql,
    cosine_expr,
    norm_expr,
    train_ivf_centroids,
)


def _as_centroid_list(centroids) -> list[tuple[int, list[float]]]:
    """Normalize the ``centroids`` argument to ``[(cid, vec)]``.

    DataFrames must carry (id, vector) as their first two columns (the
    ``write_ivf_index``/oracle-fixture layout ``(cid, cent)``).  The
    vectors are used AS GIVEN — no re-normalization, so a provided
    codebook stays bit-identical to what the caller (and the oracle)
    sees; `train_ivf_centroids` output is already unit-norm."""
    if isinstance(centroids, DataFrame):
        rows = centroids.collect()
        return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)
    return sorted((int(cid), list(vec)) for cid, vec in centroids)


def semdedup(
    vectors: DataFrame,
    centroids=None,
    threshold: float = 0.95,
    n_centroids: int = 8,
    n_iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per input vector: (vec_id, cell, centroid_sim, keep).

    ``centroids``: ``[(cid, unit_vec)]``, a (cid, cent) DataFrame, or
    None to train on ``vectors`` (`train_ivf_centroids` semantics,
    including the ``sample_mod`` cap).  ``keep=False`` marks the rows
    the SemDeDup rule discards; filter on it (or semi-join the kept ids
    back) to materialize the deduplicated corpus.
    """
    if centroids is None:
        cents = train_ivf_centroids(
            vectors,
            n_centroids=n_centroids,
            n_iters=n_iters,
            id_col=id_col,
            vec_col=vec_col,
            sample_mod=sample_mod,
        )
    else:
        cents = _as_centroid_list(centroids)
    best = F.expr(f"array_max(array({_ivf_struct_entries_sql(vec_col, cents)}))")
    nv = norm_expr(F.col(vec_col))
    assigned = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        (-best["nid"]).alias("cell"),
        F.when(nv > 0, best["d"] / nv).otherwise(F.lit(0.0)).alias("centroid_sim"),
    )
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("_vec").alias("a_vec"),
        "cell",
        F.col("centroid_sim").alias("a_sim"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("_vec").alias("b_vec"),
        "cell",
        F.col("centroid_sim").alias("b_sim"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(cosine_expr(F.col("a_vec"), F.col("b_vec")) >= F.lit(threshold))
        .filter(
            (F.col("a_sim") < F.col("b_sim"))
            | ((F.col("a_sim") == F.col("b_sim")) & (F.col("a_id") < F.col("b_id")))
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell",
        "centroid_sim",
        F.col("_dropped").isNull().alias("keep"),
    )
