"""Sweep-line interval analytics (L127/L128): the +1/−1 boundary-sweep
primitive behind "how many are active at once" and "where do two
interval sets overlap" — both as ONE keyed window pass, never a
self-join.

The textbook relational forms are quadratic (count-overlaps =
intervals × points θ-join; set-intersect = intervals × intervals
θ-join); the sweep converts each to a sorted scan: explode every
interval into a ``(t, +1)`` start and a ``(t, −1)`` end event, sort by
time within the key, take a running sum.  Half-open ``[start, end)``
semantics throughout — touching intervals do not overlap, zero-length
intervals contribute nothing — matching `graph/temporal.py
coalesce_intervals` (the union of this algebra; L128 is its
intersection, completing union/intersect over interval sets).

* ``concurrency`` — the step function ``(key, t, n_active)``: n_active
  intervals cover ``[t, next_t)``.  Ties collapse (both boundaries at
  one t fold into one step row), ends sort before starts at equal t
  by the half-open rule (the sum is taken after grouping per t, which
  handles it exactly).
* ``max_concurrency`` — ``(key, peak, at_t)`` with the EARLIEST time
  the peak is reached (deterministic argmax).
* ``interval_intersect`` — per key, the coalesced segments covered by
  AT LEAST ONE interval of BOTH sets: two independent coverage sums
  over the merged boundary stream, segments where both are positive,
  adjacent segments merged (gaps-and-islands, same discipline as
  coalesce_intervals).

Scale: one exchange per operator (hash by key, sort within); boundary
count = 2×intervals, linear.  A single key's boundaries must fit a
partition — the sessionize assumption, loud in the docstring rather
than silently wrong.

No reference counterpart; interval algebra extends the temporal family
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _events(df: DataFrame, key: str, start: str, end: str) -> DataFrame:
    """(key, t, delta) boundary events; invalid/zero-length dropped."""
    ok = df.filter(
        F.col(start).isNotNull() & F.col(end).isNotNull() & (F.col(end) > F.col(start))
    )
    return ok.select(
        F.col(key).alias("k"), F.col(start).alias("t"), F.lit(1).alias("d")
    ).unionByName(
        ok.select(F.col(key).alias("k"), F.col(end).alias("t"), F.lit(-1).alias("d"))
    )


def _check(df: DataFrame, cols: list[str]) -> None:
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")


def concurrency(df: DataFrame, key: str, start: str, end: str) -> DataFrame:
    """Step function ``(key, t, n_active)`` under half-open [start,
    end) — one row per distinct boundary time, valid until the key's
    next row."""
    _check(df, [key, start, end])
    ev = (
        _events(df, key, start, end)
        .groupBy("k", "t")
        .agg(F.sum("d").alias("d"))
    )
    w = Window.partitionBy("k").orderBy("t")
    return ev.select(
        F.col("k").alias(key),
        "t",
        F.sum("d").over(w).cast("long").alias("n_active"),
    )


def max_concurrency(df: DataFrame, key: str, start: str, end: str) -> DataFrame:
    """``(key, peak, at_t)`` — the peak overlap per key and the
    earliest boundary time it is reached."""
    steps = concurrency(df, key, start, end)
    return steps.groupBy(key).agg(
        F.max("n_active").alias("peak"),
        F.min_by("t", F.struct((-F.col("n_active")).alias("n"), F.col("t").alias("t"))).alias("at_t"),
    )


def interval_intersect(
    a: DataFrame, b: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Per-key coalesced segments ``(key, start, end)`` covered by both
    interval sets (each set's own overlaps count once — coverage, not
    multiplicity)."""
    _check(a, [key, start, end])
    _check(b, [key, start, end])
    ev = (
        _events(a, key, start, end)
        .select("k", "t", F.col("d").alias("da"), F.lit(0).alias("db"))
        .unionByName(
            _events(b, key, start, end).select(
                "k", "t", F.lit(0).alias("da"), F.col("d").alias("db")
            )
        )
        .groupBy("k", "t")
        .agg(F.sum("da").alias("da"), F.sum("db").alias("db"))
    )
    w = Window.partitionBy("k").orderBy("t")
    cov = ev.select(
        "k",
        "t",
        F.sum("da").over(w).alias("ca"),
        F.sum("db").over(w).alias("cb"),
        F.lead("t").over(w).alias("t_next"),
    )
    seg = cov.filter(
        (F.col("ca") > 0) & (F.col("cb") > 0) & F.col("t_next").isNotNull()
        & (F.col("t_next") > F.col("t"))
    )
    # gaps-and-islands merge of adjacent covered segments (flag and
    # cumulative sum in separate selects — windows don't nest)
    w2 = Window.partitionBy("k").orderBy("t")
    flagged = seg.select(
        "k",
        "t",
        "t_next",
        F.when(
            F.lag("t_next").over(w2).isNull()
            | (F.lag("t_next").over(w2) < F.col("t")),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    isl = flagged.select(
        "k",
        "t",
        "t_next",
        F.sum("new_island")
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return (
        isl.groupBy("k", "island")
        .agg(F.min("t").alias(start), F.max("t_next").alias(end))
        .select(F.col("k").alias(key), start, end)
    )
