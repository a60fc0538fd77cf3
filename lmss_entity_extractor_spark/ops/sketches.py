"""Persistable, mergeable distinct-count sketches (L109): HLL sketch
COLUMNS as data — the mergeable-summaries pattern (Agarwal et al.
PODS'12) that makes incremental distinct-count analytics possible at
100 TB.

``approx_count_distinct`` (the L23 sketch contract) answers one query
and throws the summary away; here the summary IS the output:

* ``build_distinct_sketches`` — one scan → per-group Apache DataSketches
  HLL sketches (Spark 4 ``hll_sketch_agg``), a BINARY column you persist
  like any other (daily partitions of per-domain sketches, a few KB per
  group at lg_k=12 regardless of input size);
* ``rollup_distinct_estimate`` — re-aggregate PERSISTED sketches to any
  coarser grain with ``hll_union_agg`` (register-wise max: associative,
  commutative, idempotent — re-delivered sketches cannot double-count)
  and estimate.  The month-over-domains rollup reads 30 sketch rows per
  domain, NEVER the 100 TB base table again.

Estimates are approximate (~2% at lg_k=12, exact in the sparse
regime), and NOT bit-stable across merge topologies: the union is
register-idempotent (re-delivered sketches cannot inflate registers),
but the datasketches estimator takes a different path after a union
(HIP vs composite), so the same logical union reached via different
groupings/partitionings can move the estimate WITHIN the error bound.
Tests pin the tolerance, never bitwise equality; the contract query
publishes tolerance FLAGS against the exact count (the L23 oracle
pattern).  For a fixed plan on fixed input the result is
deterministic run-to-run.

No reference counterpart; generalizes the reference's one-shot global
stats (`app/main.py` index stats) to incrementally maintainable ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One scan → ``(group_cols..., n_rows, sketch)``: a persistable
    partial aggregate for COUNT(DISTINCT value) per group."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    for c in list(group_cols) + [value_col]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("sketch"),
    )


def rollup_distinct_estimate(
    sketches: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union persisted sketches up to ``rollup_cols`` grain and
    estimate: ``(rollup_cols..., n_groups_merged, distinct_est)`` —
    the base table is never rescanned."""
    for c in list(rollup_cols) + [sketch_col]:
        if c not in sketches.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    return sketches.groupBy(*rollup_cols).agg(
        F.count(F.lit(1)).alias("n_groups_merged"),
        F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}))").alias(
            "distinct_est"
        ),
    )


def distinct_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    join_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Set-operation estimates from PERSISTED distinct sketches (L126):
    per joined group, ``(n_a, n_b, n_union, n_intersect, jaccard)`` —
    union via register-max ``hll_union``, intersection by inclusion-
    exclusion (|A∩B| = |A| + |B| − |A∪B|, clamped at 0), Jaccard from
    the two.  The question "how many users/documents do these two
    segments share" answered WITHOUT rescanning either base table —
    the rollup story of ``rollup_distinct_estimate`` extended to set
    algebra.

    Honesty: inclusion-exclusion SUBTRACTS estimates, so the relative
    error on a small intersection of two large sets blows up (absolute
    error stays ~2%·|A∪B| at lg_k=12; exact in the sparse regime) —
    same tolerance-flag stance as the L109 rollup, pinned by the
    contract query.  Inner join on ``join_cols``: groups present on
    only one side have no defined overlap.
    """
    for c in list(join_cols) + [sketch_col]:
        if c not in a.columns:
            raise ValueError(f"column {c!r} not in left sketches")
        if c not in b.columns:
            raise ValueError(f"column {c!r} not in right sketches")
    sa = a.select(*join_cols, F.col(sketch_col).alias("__sa"))
    sb = b.select(*join_cols, F.col(sketch_col).alias("__sb"))
    j = sa.join(sb, join_cols)
    n_a = F.expr("round(hll_sketch_estimate(__sa))").cast("long")
    n_b = F.expr("round(hll_sketch_estimate(__sb))").cast("long")
    n_u = F.expr("round(hll_sketch_estimate(hll_union(__sa, __sb)))").cast("long")
    n_i = F.greatest(n_a + n_b - n_u, F.lit(0).cast("long"))
    return j.select(
        *join_cols,
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        n_u.alias("n_union"),
        n_i.alias("n_intersect"),
        F.round(
            F.when(n_u == 0, F.lit(0.0)).otherwise(n_i / n_u), 6
        ).alias("jaccard"),
    )


def capture_recapture(
    df_a: "DataFrame",
    df_b: "DataFrame",
    id_col: str,
):
    """One row ``(n_a, n_b, n_overlap, lincoln_petersen, chapman,
    se_chapman)`` — capture-recapture population estimation (L246):
    how big is the TRUE universe when two independent passes each saw
    part of it — the coverage auditor for this engine's own discovery
    operators (how many near-dup clusters / entities / quality
    violations exist, estimated from two independent detection passes
    such as MinHash L2 vs SimHash L3):

        Lincoln-Petersen  N̂ = n_a·n_b / m
        Chapman           N̂ = (n_a+1)(n_b+1)/(m+1) − 1   (bias-corr.)
        se(Chapman) = sqrt((n_a+1)(n_b+1)(n_a−m)(n_b−m)
                           / ((m+1)²(m+2)))

    Inputs are two id tables (dedup'd here); counts are exact
    integers from two distinct-aggs + one semi-join count; every
    estimate is a fixed IEEE tree — bit-identical.  m = 0 (disjoint
    passes) → NULL Lincoln-Petersen (Chapman stays defined — that is
    WHY it exists).

    Scale shape: two distinct-aggs + one equi-join on id — the L1
    exact-dedup shuffle shape.

    No reference counterpart; coverage-audit analytics per SURVEY
    §2.11.
    """
    a = df_a.select(F.col(id_col).alias("_i")).filter(
        F.col("_i").isNotNull()
    ).distinct()
    b = df_b.select(F.col(id_col).alias("_i")).filter(
        F.col("_i").isNotNull()
    ).distinct()
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    m = a.join(b, "_i").agg(F.count(F.lit(1)).alias("n_overlap"))
    j = na.crossJoin(nb).crossJoin(m)
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    md_ = F.col("n_overlap").cast("double")
    lp = (nad * nbd) / md_
    chapman = ((nad + F.lit(1.0)) * (nbd + F.lit(1.0))) / (
        md_ + F.lit(1.0)
    ) - F.lit(1.0)
    var = (
        (nad + F.lit(1.0))
        * (nbd + F.lit(1.0))
        * (nad - md_)
        * (nbd - md_)
    ) / (
        (md_ + F.lit(1.0))
        * (md_ + F.lit(1.0))
        * (md_ + F.lit(2.0))
    )
    return j.select(
        "n_a",
        "n_b",
        "n_overlap",
        F.when(F.col("n_overlap") > 0, lp).alias("lincoln_petersen"),
        chapman.alias("chapman"),
        F.sqrt(var).alias("se_chapman"),
    )
