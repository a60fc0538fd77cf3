"""Keyed table diff / reconciliation (L108): compare two snapshots of a
keyed table and classify every key as ``added`` / ``removed`` /
``changed`` / ``unchanged``, with per-column change flags.

The operator behind every migration cutover, backfill validation, and
"did the rewrite change anything?" audit — including this repo's own
determinism story (two pipeline runs should diff to zero rows; the
resume tests assert byte-identity, this is the user-facing relational
form that also SAYS WHAT moved).

Shape at 100 TB: ONE full outer join on the key (the unavoidable
shuffle lower bound for keyed comparison), all change detection as
null-safe struct comparisons inside the join's projection — no second
pass, no per-column joins, no collects.  For append-only tables the
removed class doubles as a corruption alarm.

Output: key columns + ``diff_kind`` + ``changed_cols`` (sorted array,
empty for added/removed/unchanged) + each compared column twice
(``left_<c>``, ``right_<c>``).  ``include_unchanged=False`` (default)
keeps the result delta-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff ``right`` (new) against ``left`` (old) on ``key_cols``.

    ``compare_cols`` defaults to all shared non-key columns.  Rows are
    classified by key presence (added = right-only, removed =
    left-only) and, for keys on both sides, by null-safe per-column
    comparison.  Duplicate keys on either side are the caller's bug —
    they fan out through the join and misreport; dedup first (L105's
    ``assert_unique_keys`` is the loud pre-flight).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key column {c!r} must exist on both sides")
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in right.columns and c not in key_cols
        ]
    else:
        for c in compare_cols:
            if c not in left.columns or c not in right.columns:
                raise ValueError(f"compare column {c!r} must exist on both sides")
    l = left.select(
        *key_cols,
        F.lit(True).alias("__in_l"),
        *[F.col(c).alias(f"left_{c}") for c in compare_cols],
    )
    r = right.select(
        *key_cols,
        F.lit(True).alias("__in_r"),
        *[F.col(c).alias(f"right_{c}") for c in compare_cols],
    )
    j = l.join(r, key_cols, "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"left_{c}").eqNullSafe(F.col(f"right_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    kind = (
        F.when(F.col("__in_l").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("diff_kind", kind).withColumn(
        "changed_cols",
        F.when(F.col("diff_kind") == "changed", changed).otherwise(
            F.array().cast("array<string>")
        ),
    )
    if not include_unchanged:
        out = out.filter(F.col("diff_kind") != "unchanged")
    return out.select(
        *key_cols,
        "diff_kind",
        "changed_cols",
        *[f"left_{c}" for c in compare_cols],
        *[f"right_{c}" for c in compare_cols],
    )
