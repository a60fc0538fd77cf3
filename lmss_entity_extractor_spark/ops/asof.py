"""As-of join: enrich each left row with the most recent right row.

A training-data pipeline staple (e.g. "attach the latest prior click to
every purchase", "join each turn to the newest config snapshot") that
Spark has no built-in operator for.  The naive form is a range θ-join
(quadratic per key); this implementation is the scalable composition:

  1. tag both inputs and union them (narrow),
  2. one window sweep per key ordered by (ts, side, tie): running
     ``last(right_payload, ignorenulls=True)`` over rows-unbounded-
     preceding — a single keyed shuffle on the join keys,
  3. keep the left rows; the carried struct is the as-of match.

Cost at scale: exactly one shuffle of |left| + |right| rows on the join
keys — the same lower bound as a keyed equi-join; skewed keys are
handled by AQE the same way.  Semantics: backward inclusive
(right.ts <= left.ts); ties among right rows at the same (keys, ts)
resolve to the greatest ``tie_col`` (deterministic); right rows sort
before left rows at equal ts so an equal-timestamp right row IS
matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tie_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row with ``right_cols`` of its as-of match
    appended as ``{prefix}{col}`` (null when no right row precedes it).
    ``tie_col`` must order right rows totally within (on, ts_col).
    """
    left_cols = left.columns
    l_tagged = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_cols).alias("_l"),
        F.lit(None).cast(right.select(tie_col).schema[0].dataType).alias("_tie"),
        F.lit(None)
        .cast(right.select(F.struct(*right_cols).alias("s")).schema[0].dataType)
        .alias("_r"),
    )
    r_tagged = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left_cols).alias("s")).schema[0].dataType).alias("_l"),
        F.col(tie_col).alias("_tie"),
        F.struct(*right_cols).alias("_r"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_tagged.unionByName(r_tagged).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left_cols] + [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return swept.filter(F.col("_side") == 1).select(*out_cols)
