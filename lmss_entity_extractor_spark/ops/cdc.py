"""CDC changelog apply (L116): fold an ordered insert/update/delete
changelog into a base snapshot — the Debezium-feed / Delta
``MERGE WITH DELETES`` shape, completing the keyed-maintenance family
(L105 upsert has no deletes; L90 keyed deletion has no
upserts; L108 diff AUDITS two snapshots, this PRODUCES the next one).

Semantics: per key, the change with the highest ``order_col`` wins
(last-write-wins over the whole changelog, not per-batch);

    winner.op ∈ {I, U}  → the winner row replaces/creates the key
    winner.op =  D      → the key is gone, whatever base held
    no change for key   → base row survives untouched

Earlier changes for the same key are shadowed — an I followed by a D
nets to absent, a D followed by an I nets to the insert: exactly the
compaction rule of a log-structured table.

Spark-first shape (the L105 discipline, one step further):

    winners = one window row_number over the changelog (delta-sized)
    result  = winners[op != D]  UNION ALL  (base ANTI JOIN changed keys)

The 100 TB base is never shuffled wide: the anti-join broadcasts when
the delta is small, and the window runs on the delta only.  Ties on
(key, order_col) are REFUSED loudly (bounded 5-key collect) — two
changes to one key at one version is feed corruption and silently
picking one would be nondeterministic; ``tiebreak_cols`` opts into a
documented total order instead.

Oracle-able end-to-end: winner selection is a SQL window, survival a
NOT EXISTS — the contract query replays a minted changelog against
customer and checks the folded snapshot row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from .validate import validation_enabled

_OPS = ("I", "U", "D")


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Fold ``changes`` (base columns + ``op_col`` + ``order_col``)
    into ``base``; returns the next snapshot with base's schema."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols:
        if c not in base.columns:
            raise ValueError(f"key column {c!r} not in base")
    expected = set(base.columns) | {op_col, order_col}
    if set(changes.columns) != expected:
        raise ValueError(
            f"changes columns {sorted(changes.columns)} != base + op/order "
            f"{sorted(expected)}"
        )
    for c in tiebreak_cols or []:
        if c not in changes.columns:
            raise ValueError(f"tiebreak column {c!r} not in changes")

    if validation_enabled():
        bad_ops = (
            changes.select(op_col)
            .filter(~F.col(op_col).isin(*_OPS))
            .limit(5)
            .collect()
        )
        if bad_ops:
            raise ValueError(
                f"op column must be one of {_OPS}, found {[r[op_col] for r in bad_ops]}"
            )

    if not tiebreak_cols:
        if validation_enabled():
            ties = (
                changes.groupBy(*key_cols, order_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(5)
                .collect()
            )
            if ties:
                raise ValueError(
                    "tied (key, order) changes (pass tiebreak_cols for a total "
                    f"order): {[tuple(r[c] for c in key_cols + [order_col]) for r in ties]}"
                )

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(),
        *[F.col(c).desc() for c in (tiebreak_cols or [])],
    )
    winners = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = winners.filter(F.col(op_col) != "D").select(*base.columns)
    changed_keys = winners.select(*key_cols).distinct()
    survivors = base.join(changed_keys, key_cols, "left_anti")
    return upserts.unionByName(survivors)
