"""Golden-record survivorship (L122): collapse each duplicate cluster
to ONE canonical record under per-column precedence rules — the MDM
step after entity resolution (L57 `graph/er.py` finds the clusters;
this decides what the merged record SAYS).

Rule grammar (per output column, declarative and serializable — the
L113 stance):

    ("latest", col, ts_col)    the most recent NON-NULL value (highest
                               ts_col among rows where col is non-null
                               — a null in a newer row never erases an
                               older observation; ties broken by the
                               deterministic tiebreak below)
    ("max", col) / ("min", col)  extreme non-null value
    ("majority", col)          most frequent non-null value; count
                               ties break by the LOWEST value (total
                               order, never a nondeterministic pick)

Execution: ONE keyed exchange.  latest/min/max fold into a
single groupBy via ``max_by``/``min``/``max`` over null-punished
structs; each ``majority`` rule needs its own (cluster, value) count —
one extra combinable aggregation + broadcast-sized join back (value
domains are bounded per cluster).  Nothing is row-iterated; every rule
is an aggregate expression.

Determinism: every rule ends in a total order — ``latest`` ties break
by (ts, value), ``majority`` ties by (count DESC, value ASC) — so the
golden record is a pure function of the cluster contents (the repo's
cross-parallelism bit-identity discipline).

No reference counterpart; completes the ER family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KINDS = ("latest", "max", "min", "majority")


def golden_records(
    df: DataFrame,
    cluster_col: str,
    rules: list[tuple],
) -> DataFrame:
    """One row per cluster: ``(cluster_col, n_members, <rule columns>)``
    with each column elected by its rule."""
    if not rules:
        raise ValueError("rules must be a non-empty list")
    if cluster_col not in df.columns:
        raise ValueError(f"column {cluster_col!r} not in DataFrame")
    seen: set[str] = set()
    for rule in rules:
        kind, col = rule[0], rule[1]
        if kind not in _KINDS:
            raise ValueError(f"unknown rule kind {kind!r} (one of {_KINDS})")
        if col not in df.columns:
            raise ValueError(f"rule {rule!r}: column {col!r} not in DataFrame")
        if kind == "latest":
            if len(rule) != 3 or rule[2] not in df.columns:
                raise ValueError(f"{kind} needs (kind, col, ts_col in DataFrame), got {rule!r}")
        elif len(rule) != 2:
            raise ValueError(f"{kind} needs (kind, col), got {rule!r}")
        if col in seen:
            raise ValueError(f"duplicate rule for column {col!r}")
        seen.add(col)

    aggs = [F.count(F.lit(1)).alias("n_members")]
    majority_rules = []
    for rule in rules:
        kind, col = rule[0], rule[1]
        c = F.col(col)
        if kind == "latest":
            ts = F.col(rule[2])
            # max_by over a (ts, value) struct restricted to non-null
            # values: recency first, value as the deterministic tiebreak
            key = F.when(c.isNotNull(), F.struct(ts.alias("t"), c.alias("v")))
            aggs.append(F.max(key).getField("v").alias(col))
        elif kind == "max":
            aggs.append(F.max(c).alias(col))
        elif kind == "min":
            aggs.append(F.min(c).alias(col))
        else:
            majority_rules.append(col)

    out = df.groupBy(cluster_col).agg(*aggs)

    for col in majority_rules:
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(cluster_col, col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        # winner per cluster: count DESC, value ASC — via min over a
        # sortable (−count, value) struct
        winner = counts.groupBy(cluster_col).agg(
            F.min(
                F.struct((-F.col("__n")).alias("nc"), F.col(col).alias("v"))
            )
            .getField("v")
            .alias(col)
        )
        out = out.join(winner, cluster_col, "left")

    ordered = [cluster_col, "n_members"] + [r[1] for r in rules]
    return out.select(*ordered)
