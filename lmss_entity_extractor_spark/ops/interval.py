"""Range (interval) join — points matched to containing intervals.

Spark has no built-in range-join operator; the naive form is a θ-join
that Catalyst plans as BroadcastNestedLoopJoin (quadratic work against
the full point set).  This is the scalable composition every large
engine uses (e.g. the bucketed range-join pattern):

  1. pick a bucket width ~ the typical interval length,
  2. explode each interval into the coarse buckets it overlaps
     (``sequence(floor(start/W), floor(end/W))`` — replication factor
     ~= interval_len/W + 1, a constant chosen by the caller),
  3. tag each point with its single bucket (narrow),
  4. equi-join on (keys..., bucket) — an ordinary hash/sort-merge
     shuffle join AQE can size and skew-split — and post-filter the
     exact containment predicate.

No dedup pass is needed: a point has exactly ONE bucket, so each
(point, interval) pair meets at most once.  Cost at scale: one keyed
shuffle of |points| + |intervals| * replication rows — the equi-join
lower bound — instead of the θ-join's |points| * |intervals|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_width: float = 1.0,
    end_inclusive: bool = True,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [start, end] range contains its ``point_col`` value (numeric), with
    optional equi-keys ``on`` required to match as well.

    Output columns: all of ``points``' plus ``intervals``' non-key
    columns (names must not collide — rename beforehand).  Intervals
    with end < start produce no matches (empty bucket sequence would
    error: they are filtered out).  ``bucket_width`` trades interval
    replication (~len/width) against candidate-pair selectivity; pick it
    near the typical interval length.
    """
    p = points.withColumn("_pb", F.floor(F.col(point_col) / F.lit(float(bucket_width))))
    iv = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(float(bucket_width))),
                F.floor(F.col(end_col) / F.lit(float(bucket_width))),
            )
        ),
    )
    cond = p["_pb"] == iv["_ib"]
    for k in on:
        cond = cond & (p[k] == iv[k])
    contained = (p[point_col] >= iv[start_col]) & (
        p[point_col] <= iv[end_col] if end_inclusive else p[point_col] < iv[end_col]
    )
    out_cols = [p[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in on
    ]
    return p.join(iv, cond).filter(contained).select(*out_cols)
