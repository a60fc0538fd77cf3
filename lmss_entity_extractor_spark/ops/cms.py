"""Count-min sketch columns (L120): mergeable per-group FREQUENCY
summaries (Cormode & Muthukrishnan, J.Alg 2005) — the third leg of the
sketch family (L109 HLL answers "how many distinct", L101/L106
Misra-Gries answers "which are frequent", CMS answers "how often is
THIS item" for any item, long after the base table is gone).

Relational form — the sketch IS a table, not a binary blob:

    (group_cols..., r, c, cnt)   r < depth, c = h_r(item) < width

* build — one scan, one map-side-combinable count per (group, r, c):
  at most depth × min(width, distinct items) rows per group, persisted
  like any table and partition-prunable by group;
* merge — UNION ALL + re-sum (counter addition is the CMS merge rule;
  re-summing is exact, so increments can be built per day and rolled
  up forever);
* estimate — probes explode to depth rows, ONE equi-join against the
  sketch on (group, r, c), min over r; an absent cell is a true zero
  (nothing ever hashed there), coalesced to 0.

Guarantees: est >= true count ALWAYS (only collisions inflate);
est <= true + eps·N with probability 1-delta for width >= e/eps,
depth >= ln(1/delta).

Hashing is EXACT integer arithmetic, reproducible in ANSI SQL (the
knuth_hash stance, L16/L115): h_r(x) = ((a_r·fold(x) + b_r) mod P)
mod width with P = 2^31-1 and documented per-row constants; fold =
pmod(x, P) keeps every product inside int64 under ANSI mode.  Item
keys must be NUMERIC — dictionary-encode strings first (L61
`graph/dictenc.py`), which a 100 TB pipeline wants anyway.  The whole
operator is therefore deterministic and value-oracle-able cell by
cell — a property binary datasketches blobs cannot offer.

No reference counterpart; extends the sketch contract (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_P = 2147483647  # 2^31 - 1, prime


def _a(r: int) -> int:
    return (2654435761 + r * 40503) % _P


def _b(r: int) -> int:
    return (97 + r * 1009) % _P


def _cell(item, r: int, width: int):
    """h_r(item) as a pure-integer column expression."""
    folded = F.pmod(item.cast("long"), F.lit(_P))
    return F.pmod(
        F.pmod(folded * F.lit(_a(r)) + F.lit(_b(r)), F.lit(_P)), F.lit(width)
    ).cast("int")


def _check(depth: int, width: int) -> None:
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    if not 2 <= width <= 1 << 24:
        raise ValueError(f"width must be in [2, 2^24], got {width}")


def cms_build(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """One scan → the sketch table ``(group_cols..., r, c, cnt)``.
    NULL items are dropped (they cannot be probed)."""
    _check(depth, width)
    for col in list(group_cols) + [item_col]:
        if col not in df.columns:
            raise ValueError(f"column {col!r} not in DataFrame")
    item = F.col(item_col)
    rows = df.filter(item.isNotNull()).select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cell(item, r, width).alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    )
    return rows.groupBy(*group_cols, F.col("rc.r").alias("r"), F.col("rc.c").alias("c")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge sketch tables built with the SAME (depth, width): UNION
    ALL + re-sum — exact counter addition, safe to apply repeatedly to
    disjoint increments."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """``(group_cols..., item_col, est)`` — the CMS point estimate for
    every probe row (distinct on group+item): min over rows of the
    probed cells, absent cells = true zero."""
    _check(depth, width)
    item = F.col(item_col)
    p = probes.select(*group_cols, item_col).distinct().filter(item.isNotNull())
    exploded = p.select(
        *group_cols,
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), _cell(item, r, width).alias("c")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(*group_cols, item_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    joined = exploded.join(sketch, [*group_cols, "r", "c"], "left").select(
        *group_cols, item_col, "r", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(*group_cols, item_col).agg(F.min("cnt").alias("est"))


def cms_join_size(
    sk_a: DataFrame,
    sk_b: DataFrame,
    depth: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join cardinality estimate from two sketches built on the
    JOIN KEY with the same (depth, width): ``min_r Σ_c cntA(r,c) ·
    cntB(r,c)`` (the AMS/CMS inner-product estimator, Cormode &
    Muthukrishnan §4.2) — est >= |A ⋈ B| always (collision cross-terms
    only add), within eps·|A|·|B| w.h.p.  The planner's question
    ("how big is this join") answered from KB-sized summaries without
    touching either table.

    Rows of the depth grid with no common cells contribute a true 0
    (disjoint key sets) — filled explicitly so the min sees them.
    """
    _check(depth, 2)
    g = list(group_cols or [])
    a = sk_a.select(*g, "r", "c", F.col("cnt").alias("cnt_a"))
    b = sk_b.select(*g, "r", "c", F.col("cnt").alias("cnt_b"))
    ip = (
        a.join(b, [*g, "r", "c"])
        .groupBy(*g, "r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    spark = sk_a.sparkSession
    grid = spark.range(0, depth).select(F.col("id").cast("int").alias("r"))
    if g:
        groups = sk_a.select(*g).distinct()
        grid = groups.crossJoin(grid)
    filled = grid.join(ip, [*g, "r"], "left").select(
        *g, "r", F.coalesce("ip", F.lit(0)).alias("ip")
    )
    return filled.groupBy(*g).agg(F.min("ip").alias("join_size_est"))
