"""One-pass table profiling (L103): the ANALYZE TABLE / data-quality
audit shape — per-column row count, null count, exact distinct count,
and min/max — for a 100 TB table in a single scan.

Why an operator: every ingest of a new corpus slice starts with "what
is in this table?", and the naive form (one query per column) scans the
table 4x#columns times.  Here all columns profile in ONE ``agg`` over
one scan: count/min/max are plain combinable aggregates, and the exact
distinct counts compile to Spark's Expand-based multi-distinct
rewrite — one pass over the data, rows duplicated #distinct-agg ways
in the map stage (the documented cost of exactness; swap in
``approx_count_distinct`` when a 2% error is acceptable at 100 TB,
the L23 sketch-contract query prices exactly that trade).

min/max are computed on the NATIVE type (so numeric columns compare
numerically, not lexicographically) and cast to string afterwards —
one uniform output schema for any profiled table.  Numeric/string/date
casts are engine-portable; float and nested-type string forms are
engine-specific (the contract query profiles int/string/date columns).

The result is assembled driver-side from the single 1-row aggregate —
bounded by #columns, the same class as the pipeline's other stats
collects (`lineage.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCHEMA = (
    "column string, n_rows long, n_nulls long, n_distinct long, "
    "min_value string, max_value string"
)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan — one output row
    per column: ``(column, n_rows, n_nulls, n_distinct, min_value,
    max_value)``.  ``n_distinct`` is exact and excludes NULLs; min/max
    are native-typed extremes rendered as strings (NULL on empty or
    all-NULL input)."""
    cols = list(columns) if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"nn_{i}"),
            F.count_distinct(F.col(c)).alias(f"nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{i}"),
        ]
    r = df.agg(*aggs).first()
    rows = [
        (c, r["__n"], r["__n"] - r[f"nn_{i}"], r[f"nd_{i}"], r[f"mn_{i}"], r[f"mx_{i}"])
        for i, c in enumerate(cols)
    ]
    return df.sparkSession.createDataFrame(rows, schema=_SCHEMA)
