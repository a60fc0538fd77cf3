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

import pandas as pd

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


def jaro_winkler(s1: str, s2: str) -> float:
    """Plain-python Jaro-Winkler kernel, matching the convention of
    DuckDB / RapidFuzz (verified empirically in tests): empty side →
    0.0; match window ⌊max(l1,l2)/2⌋−1 (clamped at 0); transpositions
    = ⌊mismatched positions of the matched sequences / 2⌋ (FLOOR
    division — the RapidFuzz/DuckDB convention, pinned by the fuzz
    test against DuckDB); Winkler
    prefix boost (≤ 4 chars, weight 0.1) applied only when jaro >
    0.7."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flag2 = [False] * l2
    m1 = []
    for i, ch in enumerate(s1):
        lo = i - window
        if lo < 0:
            lo = 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not flag2[j] and s2[j] == ch:
                flag2[j] = True
                m1.append(ch)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    m2 = [s2[j] for j in range(l2) if flag2[j]]
    t = sum(a != b for a, b in zip(m1, m2)) // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        jaro = jaro + 0.1 * p * (1.0 - jaro)
    return jaro


def jaro_winkler_join(
    left: DataFrame,
    right: DataFrame | None,
    left_col: str,
    right_col: str | None = None,
    *,
    min_sim: float = 0.9,
    block_prefix: int = 2,
) -> DataFrame:
    """``(a, b, sim)`` — blocked Jaro-Winkler similarity join over
    DISTINCT values (the record-linkage scorer that tolerates
    transpositions where Levenshtein charges them twice; Winkler's
    prefix boost matches how real-world names drift — endings decay,
    prefixes survive).  Same ladder as ``edit_distance_join``: distinct
    values → lowercase ``block_prefix`` equi-join block (documented
    recall trade; Winkler's own prefix assumption makes a prefix block
    the natural choice) → Arrow-batched pandas-UDF scoring (a per-row
    string kernel — the documented UDF slow path, but it runs on the
    value vocabulary, not the fact table) → threshold filter.
    ``right is None`` → deduplicated self-join (a < b)."""
    if not 0.0 <= min_sim <= 1.0 or block_prefix < 1:
        raise ValueError("min_sim must be in [0,1] and block_prefix >= 1")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                jaro_winkler(x, y) if x is not None and y is not None else None
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

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
    return cand.select("a", "b", _jw("a", "b").alias("sim")).filter(
        F.col("sim") >= F.lit(float(min_sim))
    )
