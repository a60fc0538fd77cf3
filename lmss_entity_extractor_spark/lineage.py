"""Per-partition lineage and pipeline metrics (north-rule requirement:
"per-partition lineage + metrics", BASELINE.json).

Two artifacts per checkpointed stage:

  * lineage rows — one per output partition: (stage, partition_id,
    n_rows, min/max of the stage's ordering key, input fingerprint,
    config hash, code version).  Written to
    ``<warehouse>/_lineage/<stage>/`` as parquet; a resumed or
    re-partitioned run can be audited partition-by-partition against a
    prior run.
  * observed metrics — Spark ``Observation`` aggregates collected during
    the stage's materialization action (row counts and key cardinality
    proxies), merged into the pipeline's ``metrics.json``.

The reference's only analogue is whole-run stats JSON files
(/root/reference/app/lmss_parser.py:189-193,
/root/reference/app/run_extraction.py:84-86); partition granularity is
what a 1000-executor deployment needs to locate a bad partition without
replaying the world.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observe_stage(df: DataFrame, stage: str, key_col: str | None = None):
    """Attach a Spark ``Observation`` to ``df``: row count plus an
    approximate key cardinality (the skew early-warning — rows >> keys
    means a hot key is coming for any downstream groupBy on it).

    Returns ``(observed_df, collect)`` where ``collect()`` yields the
    metric dict after the next action materializes the frame.  Unlike a
    separate ``count()`` this costs nothing extra: the aggregates ride
    along with whatever action runs anyway (K4/A4 mapping, SURVEY.md
    §2.1 — the reference's stats sinks at
    /root/reference/app/lmss_parser.py:189-193).

    Measured costs at 12M rows: count(1) and approx_count_distinct are
    free (<1s); a CONDITIONAL aggregate (sum(when(...))) inside an
    Observation runs interpreted per-row and cost 25-55s — keep observed
    expressions unconditional, filter upstream instead."""
    from pyspark.sql import Observation

    obs = Observation(f"{stage}_metrics")
    exprs = [F.count(F.lit(1)).alias("rows")]
    if key_col:
        exprs.append(F.approx_count_distinct(key_col).alias("approx_keys"))
    observed = df.observe(obs, *exprs)
    return observed, lambda: dict(obs.get)


def partition_lineage(df: DataFrame, stage: str, key_cols: list[str]) -> DataFrame:
    """One row per physical partition of ``df``: row count + key range."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key_cols:
        aggs.append(F.min(F.struct(*key_cols)).alias("key_min"))
        aggs.append(F.max(F.struct(*key_cols)).alias("key_max"))
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(*aggs)
        .withColumn("stage", F.lit(stage))
    )


def write_stage_lineage(
    materialized: DataFrame,
    warehouse: str | Path,
    stage: str,
    key_cols: list[str],
    meta: dict | None = None,
) -> dict:
    """Compute + persist lineage for a materialized stage table; returns
    summary stats (partitions, rows, max/mean rows per partition — the
    skew signal)."""
    lin = partition_lineage(materialized, stage, key_cols)
    for k, v in (meta or {}).items():
        lin = lin.withColumn(k, F.lit(str(v)))
    out = Path(warehouse) / "_lineage" / stage
    lin.coalesce(1).write.mode("overwrite").parquet(str(out))

    # summarize from the just-written (tiny) lineage parquet — re-running
    # the uncached `lin` plan would scan the full stage table a second
    # time just to produce four numbers
    rows = materialized.sparkSession.read.parquet(str(out)).agg(
        F.count(F.lit(1)).alias("partitions"),
        # a legitimately empty stage must record 0, not null — manifest/
        # metrics consumers do arithmetic on these
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows"),
        F.coalesce(F.max("n_rows"), F.lit(0)).alias("max_partition_rows"),
        F.coalesce(F.round(F.avg("n_rows"), 1), F.lit(0.0)).alias("mean_partition_rows"),
    ).collect()[0]
    return {
        "partitions": rows["partitions"],
        "rows": rows["rows"],
        "max_partition_rows": rows["max_partition_rows"],
        "mean_partition_rows": rows["mean_partition_rows"],
    }
