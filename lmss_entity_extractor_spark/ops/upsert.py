"""Keyed MERGE / upsert (L105): the Iceberg/Delta ``MERGE INTO`` shape
as a batch rewrite — matched keys take the update row, unmatched
updates insert, unmatched base rows survive.

Spark-first form: **anti-join + union**, not a row-by-row merge —

    result = dedup(updates)  UNION ALL  (base ANTI JOIN updates ON key)

one broadcast-able anti-join (updates are typically a small delta
against a 100 TB base) plus a union, zero wide shuffles of the base
when the update side broadcasts.  Updates carrying several rows per
key resolve LAST-WRITE-WINS via an explicit ``order_col`` (highest
wins, deterministic tiebreak over remaining columns) — refusing the
ambiguity instead of letting a nondeterministic ``dropDuplicates``
pick: with no ``order_col``, duplicate update keys raise.

This is the batch-table counterpart of the incremental edge table's
commit machinery (`streaming/incremental.py` owns append/delete/
compact for the pipeline's own tables; this operator is the generic
form for a user's keyed table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from .validate import validation_enabled


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    check_unique: bool = True,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key_cols``; schemas must
    carry identical column sets (positions may differ).

    Without ``order_col``, duplicate update keys are checked eagerly
    (one extra pass over the — typically small — update side; disable
    with ``check_unique=False`` if the updates are known unique)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(base.columns)} vs updates {sorted(updates.columns)}"
        )
    for c in key_cols:
        if c not in base.columns:
            raise ValueError(f"key column {c!r} not in table")
    if order_col is not None:
        if order_col not in updates.columns:
            raise ValueError(f"order column {order_col!r} not in updates")
        rest = [c for c in sorted(updates.columns) if c not in key_cols]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in rest]
        )
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif check_unique:
        assert_unique_keys(updates, key_cols)
    kept = base.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    return updates.unionByName(kept)


def assert_unique_keys(df: DataFrame, key_cols: list[str]) -> None:
    """Loud pre-flight for no-``order_col`` merges: raise if any key
    repeats (one bounded collect of offending keys, capped at 5)."""
    if validation_enabled():
        dups = (
            df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(5)
            .collect()
        )
        if dups:
            raise ValueError(
                f"duplicate update keys (pass order_col to resolve): "
                f"{[tuple(r[c] for c in key_cols) for r in dups]}"
            )
