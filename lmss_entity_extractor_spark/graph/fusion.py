"""Conflict resolution / truth discovery for multi-source KG claims
(the weighted-vote baseline of Dong, Berti-Équille & Srivastava,
VLDB'09 §2): when several sources assert different objects for the
same functional (subject, predicate) — extraction from 10^12 turns
WILL produce conflicting birthplaces, types, and titles — elect one
canonical object per (s, p) by summed source weight, and report how
contested the slot was.

Semantics:

* claims are SET-valued per source — a source asserting the same
  (s, p, o) twice counts once (one distinct up front);
* support(s,p,o) = Σ weight over the distinct sources asserting it
  (weight 1 per source when no weight column is given = majority vote);
* winner per (s,p) = max support, ties broken by object ascending —
  total and engine-reproducible;
* confidence = support / total support of the slot — a single division
  of exact integer sums when weights are integral (the recommended
  contract; float weights work but summation-order ulps become the
  caller's problem, documented here rather than hidden).

Spark-first shape: ONE map-side-combinable groupBy(s, p, o) building
supports, then ONE window over (s, p) doing the argmax + slot totals —
two keyed shuffles, the second riding a prefix of the first's key.
Nothing driver-side, no skew amplification (a hot subject with k
candidate objects costs k rows in the window, never k²).

No reference counterpart (the reference links each mention
independently and never consolidates contradicting links); extends the
KG quality family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resolve_conflicts(
    claims: DataFrame,
    *,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """Elect one object per (s, p) from multi-source ``claims``.

    Returns one row per (s, p) slot:

        (s, p, o            — the elected object,
         support            — summed weight behind the winner,
         total_support      — summed weight across all candidates,
         n_values           — distinct candidate objects in the slot,
         confidence         — support / total_support, double)
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0).cast("double")
    )
    base_cols = [
        F.col(s_col).alias("s"),
        F.col(p_col).alias("p"),
        F.col(o_col).alias("o"),
        F.col(source_col).alias("source"),
        w.alias("w"),
    ]
    # Set semantics per source: keep ONE weight per (s,p,o,source).
    # max() makes a duplicated assertion idempotent even if the caller's
    # weight column disagrees between the duplicates.
    per_source = (
        claims.select(*base_cols)
        .groupBy("s", "p", "o", "source")
        .agg(F.max("w").alias("w"))
    )
    support = per_source.groupBy("s", "p", "o").agg(F.sum("w").alias("support"))
    slot = Window.partitionBy("s", "p")
    rank_w = slot.orderBy(F.col("support").desc(), F.col("o").asc())
    return (
        support.withColumn("total_support", F.sum("support").over(slot))
        .withColumn("n_values", F.count(F.lit(1)).over(slot))
        .withColumn("_rk", F.row_number().over(rank_w))
        .filter(F.col("_rk") == 1)
        .select(
            "s",
            "p",
            "o",
            "support",
            "total_support",
            "n_values",
            (F.col("support") / F.col("total_support")).alias("confidence"),
        )
    )
