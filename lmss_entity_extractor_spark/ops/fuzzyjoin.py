"""Blocked edit-distance similarity join — the record-linkage /
label-matching primitive (match candidate entity surfaces against a
canonical vocabulary when the spellings drift).

Scale shape: the naive form is an all-pairs θ-join — quadratic, dead
at 100 TB.  This one is

- VALUE-level: both sides are projected to their DISTINCT join values
  first (surface vocabularies obey Heaps' law — far smaller than the
  row counts that carry them); callers join the output back to rows;
- BLOCKED on a lowercase prefix: candidates must share the first
  ``block_prefix`` characters — an equi-join Spark hash-partitions,
  never a cross join.  This is a documented RECALL trade
  (pairs differing inside the prefix are missed; standard blocking
  practice — pick the block from a stable region of the key);
- LENGTH-BANDED before scoring: ``|len(a) − len(b)| ≤ max_dist`` is a
  free lower bound on edit distance, applied as a cheap filter ahead
  of the O(len²) Levenshtein — the classic candidate-pruning ladder
  (band → exact) with every rung JVM-side (``F.levenshtein`` is a
  built-in codegen expression; no Python anywhere).

Self-join symmetry: when ``right is None`` the join runs against
itself and emits each unordered pair once (``a < b``), never the
mirror or the trivial (x, x) pair.

Reference counterpart: the reference scores surface↔label pairs with
fuzzy ratios per candidate in Python (`app/entity_extraction.py`);
a set-at-a-time similarity JOIN is part of the beyond-reference
mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(
    left: DataFrame,
    right: DataFrame | None,
    left_col: str,
    right_col: str | None = None,
    *,
    max_dist: int = 2,
    block_prefix: int = 2,
) -> DataFrame:
    """(a, b, dist) for distinct value pairs within ``max_dist`` edits
    that share the ``block_prefix``-char lowercase prefix.  ``right is
    None`` → deduplicated self-join (a < b)."""
    if max_dist < 0 or block_prefix < 1:
        raise ValueError("max_dist must be >= 0 and block_prefix >= 1")
    self_join = right is None
    lv = left.select(F.col(left_col).alias("a")).distinct()
    rv = (
        lv.select(F.col("a").alias("b"))
        if self_join
        else right.select(F.col(right_col or left_col).alias("b")).distinct()
    )
    lb = lv.withColumn("_blk", F.lower(F.substring("a", 1, block_prefix)))
    rb = rv.withColumn("_blk", F.lower(F.substring("b", 1, block_prefix)))
    cand = lb.join(rb, "_blk").drop("_blk")
    if self_join:
        cand = cand.filter(F.col("a") < F.col("b"))
    banded = cand.filter(
        F.abs(F.length("a") - F.length("b")) <= max_dist
    )
    return banded.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= max_dist)
