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
