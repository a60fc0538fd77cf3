"""Valid-time interval coalescing for temporal KG edges (Böhlen,
Snodgrass & Soo, VLDB'96 "Coalescing in Temporal Databases"): a triple
extracted from many turns carries many small validity intervals; the
canonical temporal form merges every chain of OVERLAPPING OR ADJACENT
intervals per (s, p, o) into one maximal interval.  Without coalescing,
10^12 turns of repeated assertions make "was this edge valid at t?"
scans proportional to mention count instead of fact count.

Gaps-and-islands, the relational classic: per (s,p,o) key, order
intervals by (start, end); an interval OPENS a new island exactly when
its start exceeds the running maximum end of everything before it
(strictly greater = adjacent intervals [a,b], [b,c] merge); the island
id is the running count of such openings; one groupBy per island emits
(min start, max end, n merged).

Spark shape: ONE window (partitioned by the key — per-key state only,
hot keys spread by the sort inside the partition, never a global sort)
+ ONE combinable groupBy.  Both engines implement the identical window
recurrence, so the oracle matches exactly — integer/timestamp bounds,
no float drift.

No reference counterpart (the reference has no temporal model);
extends the KG temporal family (SURVEY §2.11, companion to the
L32/L33 snapshot machinery which versions TABLES, not facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def coalesce_intervals(
    edges: DataFrame,
    key_cols: tuple = ("s", "p", "o"),
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """edges(key..., valid_from, valid_to) -> one row per maximal
    merged interval: (key..., valid_from, valid_to, n_merged).

    Intervals are CLOSED on both ends as given; [a,b] and [b,c] (and
    any overlap) merge, [a,b] and [b+ε,c] do not.  Rows with
    start > end are rejected loudly (a silent swap would invent
    validity)."""
    keys = list(key_cols)
    s, e = F.col(start_col), F.col(end_col)
    bad = edges.filter(s > e)
    if bad.limit(1).count() > 0:
        raise ValueError(
            f"coalesce_intervals: rows with {start_col} > {end_col} present"
        )
    order = Window.partitionBy(*keys).orderBy(start_col, end_col)
    # running max end over STRICTLY PRECEDING rows; null for the first.
    # Two projections: a window expression can't nest inside another
    # window's aggregate, so _opens materializes between them.
    prev_max_end = F.max(end_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (s > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum("_opens").over(
        order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        edges.withColumn("_opens", opens)
        .withColumn("_island", island)
        .drop("_opens")
        .groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )
