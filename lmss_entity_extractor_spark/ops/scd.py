"""SCD Type-2 change-history collapse (L104): turn an observation log
into versioned dimension rows — the slowly-changing-dimension shape
every warehouse ingest needs when a mutable entity (customer tier, doc
license, KG node label) is re-observed over time.

Input: one row per observation ``(key..., ts, attrs...)``.  Output: one
row per maximal run of consecutive identical attribute values per key:
``(key..., attrs..., valid_from, valid_to, is_current)`` where
``valid_from`` is the first observation of the run, ``valid_to`` is the
start of the NEXT run (half-open intervals, chaining exactly — the SCD2
invariant), and the last run per key carries ``valid_to = NULL`` /
``is_current = true``.

Shape at 100 TB: everything rides ONE keyed shuffle — both windows
(change-point detection via null-safe lag comparison, then lead for the
interval chain) share the same partitioning and ordering, so Catalyst
plans a single Exchange + Sort and the filter between them is
pipelined.  No self-joins, no per-key collects.

Determinism: rows order by ``(ts, attrs...)`` within a key, so
same-timestamp observations with different attributes resolve to a
fixed order (documented tiebreak — the log should carry unique
timestamps per key; when it does, the tiebreak is inert).

Distinct from valid-time interval coalescing (`graph/temporal.py`,
L67): coalescing merges PRE-EXISTING intervals that overlap; this
derives the intervals themselves from point-in-time observations with
change-point dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_collapse(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse an observation log into SCD Type-2 versioned rows."""
    for c in list(key_cols) + [ts_col] + list(attr_cols):
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    order = [F.col(ts_col)] + [F.col(c) for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # change point = first observation of the key, or any attr differing
    # from the previous observation (null-safe: NULL -> value is a change)
    changed = ~attrs.eqNullSafe(F.lag(attrs).over(w))
    pts = (
        events.select(*key_cols, ts_col, *attr_cols)
        .withColumn("__chg", F.coalesce(changed, F.lit(True)))
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    # same partitioning + ordering: rides the SAME exchange/sort
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        pts.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumnRenamed(ts_col, "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    ts_col: str,
    attr_cols: list[str],
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time dimension join (L107): enrich each fact row with
    the dimension version EFFECTIVE at the fact's timestamp — i.e. the
    version with ``valid_from <= ts < valid_to`` (open tail: NULL
    valid_to), against an SCD2 history like ``scd2_collapse`` output.

    Spark-first shape: this is NOT a range theta-join (quadratic per
    key) — it composes the as-of sweep (`ops/asof.py`: one keyed
    shuffle of |facts| + |versions| rows) with an expiry check.  The
    as-of match is the latest version starting at or before the fact;
    it is the effective one unless the history has a GAP and the match
    already expired (``valid_to <= ts``) — those facts get NULL attrs,
    exactly like the relational interval join.  Zero-length versions
    (``valid_to == valid_from``, produced by same-timestamp observation
    collisions upstream) match nothing by half-open semantics and are
    dropped before the sweep.  Versions must be non-overlapping per key
    (SCD2 output is, by construction).
    """
    for c in list(on) + ["valid_from", "valid_to"] + list(attr_cols):
        if c not in dim.columns:
            raise ValueError(f"dimension column {c!r} missing")
    if ts_col not in facts.columns:
        raise ValueError(f"fact column {ts_col!r} missing")
    versions = dim.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from"))
    ).select(
        *on, F.col("valid_from").alias(ts_col), "valid_to", *attr_cols
    )
    from .asof import asof_join

    out = asof_join(
        facts,
        versions,
        on=list(on),
        ts_col=ts_col,
        right_cols=list(attr_cols) + ["valid_to"],
        tie_col="valid_to",
        prefix=prefix,
    )
    expired = F.col(f"{prefix}valid_to").isNotNull() & (
        F.col(f"{prefix}valid_to") <= F.col(ts_col)
    )
    for c in attr_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.when(expired, F.lit(None)).otherwise(F.col(f"{prefix}{c}"))
        )
    return out.drop(f"{prefix}valid_to")
