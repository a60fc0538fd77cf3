"""Compaction planning (L176): assign small files/objects to ≈target-
byte merge buckets — the planning half of the small-files problem that
`streaming/incremental.py`'s compact step executes: given a manifest
of (file, bytes), decide WHICH files merge together so outputs land
near the target size (the 100 TB lake-maintenance chore).

Strategy (deterministic, one pass): order by (bytes DESC, id ASC) —
big files first so they don't straddle late buckets — then
bucket = floor(cum_before / target) on the EXACT integer running
total.  Properties (pinned by tests): bucket byte-sums approach the
target from above except the last; an oversized file (> target) opens
its own bucket run; same manifest → the same plan on any parallelism
(the ordering is total).

Scale note: a file MANIFEST is metadata — millions of rows at worst
for a 100 TB table — so the single global sort is a bounded, correct
cost (the data files themselves are never read).

No reference counterpart; lake-maintenance family per SURVEY §2.11
(plans for L33's expire/compact executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    id_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """``(file_id, bytes, bucket)`` — merge-bucket assignment.  NULL or
    negative sizes are refused (a silent 0 would hide manifest rot)."""
    if target_bytes < 1:
        raise ValueError("compaction_plan: target_bytes must be >= 1")
    if validation_enabled():
        n_bad = files.filter(
            F.col(size_col).isNull() | (F.col(size_col) < 0)
        ).count()
        if n_bad:
            raise ValueError(
                f"compaction_plan: {n_bad} NULL/negative size(s) in "
                f"{size_col!r} — fix the manifest"
            )
    w = (
        Window.orderBy(F.col(size_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.select(
        F.col(id_col).alias("file_id"),
        F.col(size_col).alias("bytes"),
        F.floor(cum_before / F.lit(target_bytes)).cast("long").alias("bucket"),
    )


def compaction_summary(
    files: DataFrame,
    target_bytes: int,
    id_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """``(bucket, n_files, bucket_bytes)`` — the plan's shape."""
    plan = compaction_plan(files, target_bytes, id_col, size_col)
    return plan.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bucket_bytes"),
    )
