"""PMI-weighted co-occurrence edge mining: turn (group, item)
observations into weighted association edges — the statistical
edge-builder a KG-construction pipeline runs after entity linking
("which entities appear together more often than chance?").  Pointwise
mutual information (Church & Hanks, CL'90) and its normalized form
(Bouma, GSCL'09) are the standard weights.

Relational shape: one distinct projection, one per-item count, one
within-group self-join for pair counts (cost = sum over groups of
(group size)^2 — bounded by group membership, never corpus-quadratic),
then a fixed-expression score.  ``max_group_size`` drops pathological
groups from pair generation (a conversation that links 10^5 entities
contributes 10^10 pairs of near-zero signal) — the same documented
hub-cap approximation as graph/linkpred.py; None keeps it exact.

Float discipline: PMI is computed as the FIXED expression tree
``(ln(n_co) + ln(N)) - ln(n_a) - ln(n_b)`` — no aggregation of floats,
so the only cross-engine wiggle is the log function itself: JVM
``Math.log`` and libm can disagree by 1 ulp per term (measured: a
mathematically-zero PMI lands at +-1.1e-16 on the two engines).
Counts are exact integers; consumers comparing across engines should
grid the scores (the contract query uses the half-up 1e-6 grid).  The
log-sum form also cannot overflow where the integer product
``n_co * N`` would at web scale.

No reference counterpart; extends the graph analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    observations: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_co, n_a, n_b, pmi, npmi) for item pairs
    co-occurring in >= ``min_count`` groups, item_a < item_b.
    Membership is set-semantic (duplicate (group, item) rows collapse).
    npmi is pmi / (ln N - ln n_co), +1.0 by convention when the pair
    occurs in every group (the perfect-co-occurrence limit)."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    obs = observations.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct().localCheckpoint()
    n_groups = obs.select("g").distinct().count()
    if n_groups == 0:
        raise ValueError("no groups in input")
    item_counts = obs.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    pair_src = obs
    if max_group_size is not None:
        small = (
            obs.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_group_size)
            .select("g")
        )
        pair_src = obs.join(small, "g")
    a, b = pair_src.alias("a"), pair_src.alias("b")
    pairs = (
        a.join(b, F.col("a.g") == F.col("b.g"))
        .filter(F.col("a.item") < F.col("b.item"))
        .select(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_count)
    )
    n = F.lit(float(n_groups))
    pmi = (
        (F.log(F.col("n_co").cast("double")) + F.log(n))
        - F.log(F.col("n_a").cast("double"))
        - F.log(F.col("n_b").cast("double"))
    )
    npmi = F.when(F.col("n_co") == n_groups, F.lit(1.0)).otherwise(
        pmi / (F.log(n) - F.log(F.col("n_co").cast("double")))
    )
    return (
        pairs.join(
            item_counts.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b")),
            "item_b",
        )
        .select("item_a", "item_b", "n_co", "n_a", "n_b", pmi.alias("pmi"), npmi.alias("npmi"))
    )
