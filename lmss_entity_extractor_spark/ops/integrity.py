"""Cross-table integrity audits: referential-integrity (FK orphan)
checks and functional-dependency violation discovery.

The expectations module (L113) validates ROW-LOCAL rules; these two
operators audit the properties a single row can never witness — does a
key exist in another table, and does one column set determine another
across the whole table.  Both are the audits a pipeline runs before
trusting a join or a dedup key at 100 TB: an orphaned foreign key
silently drops rows from inner joins, and a broken A→B dependency means
"group by A, take any B" is nondeterministic.

Scale shape: fk_orphans is ONE anti join (broadcast when the parent key
set is small, shuffle-hash otherwise — Catalyst's choice) + one bounded
deterministic sample; fd_violations is two cascaded combinable groupBys
(det+dep, then det) — no windows, no collects beyond the sample cap.

No reference counterpart; data-quality extension per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: list[str],
    pk_cols: list[str],
    sample: int = 5,
) -> DataFrame:
    """``(n_child, n_fk_nonnull, n_orphan_rows, n_orphan_keys,
    orphan_rate, sample_keys)`` — referential-integrity audit (L343):
    which child rows point at a parent key that does not exist.

    Standard FK semantics: a child row with ANY NULL fk column is
    exempt (not checked, not an orphan) — that is what SQL FOREIGN KEY
    does.  Orphans come from one LEFT ANTI join on the key equality;
    ``sample_keys`` is the ``sample`` LEXICALLY SMALLEST distinct
    orphan key strings ('|'-joined), so the audit row is deterministic
    and safely collectible at any scale.  ``orphan_rate`` is one
    double division over exact counts; 0 checked rows → NULL rate.
    """
    if len(fk_cols) != len(pk_cols) or not fk_cols:
        raise ValueError(
            "fk_orphans: fk_cols and pk_cols must be same-length, non-empty"
        )
    if int(sample) < 0:
        raise ValueError("fk_orphans: sample must be >= 0")
    nonnull = child.filter(
        F.lit(True)
        & F.expr(
            " AND ".join(f"`{c}` IS NOT NULL" for c in fk_cols)
        )
    )
    keyed = nonnull.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(fk_cols)]
    )
    pkeys = parent.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(pk_cols)]
    ).dropDuplicates()
    orphans = keyed.join(
        pkeys, [f"_k{i}" for i in range(len(fk_cols))], "left_anti"
    )
    okey = F.concat_ws(
        "|", *[F.col(f"_k{i}").cast("string") for i in range(len(fk_cols))]
    )
    orphan_stats = orphans.agg(
        F.count(F.lit(1)).alias("n_orphan_rows"),
        F.count_distinct(
            *[F.col(f"_k{i}") for i in range(len(fk_cols))]
        ).alias("n_orphan_keys"),
    )
    sample_df = (
        orphans.select(okey.alias("_key"))
        .distinct()
        .orderBy("_key")
        .limit(int(sample))
        .agg(F.sort_array(F.collect_list("_key")).alias("sample_keys"))
    )
    totals = child.agg(
        F.count(F.lit(1)).alias("n_child"),
    )
    nn = nonnull.agg(F.count(F.lit(1)).alias("n_fk_nonnull"))
    row = (
        totals.crossJoin(nn)
        .crossJoin(orphan_stats)
        .crossJoin(sample_df)
    )
    rate = F.when(
        F.col("n_fk_nonnull") > 0,
        F.col("n_orphan_rows").cast("double")
        / F.col("n_fk_nonnull").cast("double"),
    )
    return row.select(
        "n_child",
        "n_fk_nonnull",
        "n_orphan_rows",
        "n_orphan_keys",
        rate.alias("orphan_rate"),
        "sample_keys",
    )


def fd_violations(
    df: DataFrame,
    det_cols: list[str],
    dep_cols: list[str],
) -> DataFrame:
    """``(det..., n_rows, n_dep)`` — functional-dependency audit
    (L344): every determinant group where ``det_cols → dep_cols``
    FAILS, i.e. the group maps to more than one distinct dependent
    tuple.  The check a survivorship/dedup key must pass before
    "group by A, take the B" is deterministic.

    NULL is a VALUE here (two NULL-dep rows agree; NULL vs 'x' is a
    violation) — achieved by grouping rather than count(distinct),
    which would silently drop NULL tuples.  Two cascaded combinable
    aggregations; violating groups only (an empty result IS the
    pass signal).
    """
    if not det_cols or not dep_cols:
        raise ValueError(
            "fd_violations: det_cols and dep_cols must be non-empty"
        )
    overlap = set(det_cols) & set(dep_cols)
    if overlap:
        raise ValueError(
            f"fd_violations: columns {sorted(overlap)} on both sides"
        )
    pairs = df.groupBy(*det_cols, *dep_cols).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_det = pairs.groupBy(*det_cols).agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_dep"),
    )
    return per_det.filter(F.col("n_dep") > 1)


def sequence_audit(
    df: DataFrame,
    by: list[str],
    idx_col: str,
    base: int = 0,
) -> DataFrame:
    """``(by..., n, min_idx, max_idx, n_dupes, n_gaps, contiguous)``
    — per-key sequence-integrity audit (L345): is an index column a
    clean ``base, base+1, …`` run — the invariant every ordered
    ingest (conversation turn_idx, changelog LSN, page number) is
    supposed to hold and silently breaks under retries, loss, or
    reordering:

        n_dupes = n − n_distinct          (repeated indices)
        n_gaps  = (max−min+1) − n_distinct (missing indices in-range)
        contiguous = min==base ∧ n_dupes==0 ∧ n_gaps==0

    Exact integer arithmetic over one combinable agg (count-distinct
    is the only shuffle-widening piece, and it is exact — no sketch).
    NULL indices refused loudly: an ordering column with NULLs has no
    defined audit.
    """
    n_null = df.filter(F.col(idx_col).isNull()).count()
    if n_null:
        raise ValueError(
            f"sequence_audit: {n_null} NULL index value(s) — an "
            "ordering column must be NULL-free"
        )
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(idx_col)).alias("_nd"),
        F.min(idx_col).cast("long").alias("min_idx"),
        F.max(idx_col).cast("long").alias("max_idx"),
    )
    n_dupes = F.col("n") - F.col("_nd")
    n_gaps = (
        F.col("max_idx") - F.col("min_idx") + F.lit(1) - F.col("_nd")
    )
    return agg.select(
        *by,
        "n",
        "min_idx",
        "max_idx",
        n_dupes.alias("n_dupes"),
        n_gaps.alias("n_gaps"),
        (
            (F.col("min_idx") == F.lit(int(base)))
            & (n_dupes == 0)
            & (n_gaps == 0)
        ).alias("contiguous"),
    )
