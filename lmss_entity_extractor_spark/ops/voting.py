"""Ballot-based rank aggregation (L391/L392): Borda count and
Copeland/Condorcet pairwise majority over (voter, item, value)
ballots — the MULTI-judge leaderboard primitives next to sequential
Elo (L371, path-dependent head-to-head) and agreement-strength
Kendall's W (L247, HOW MUCH judges agree; Borda/Copeland say WHO
WINS when they vote).  Model-eval panels, A/B judge pools, and
preference-data curation all reduce to these two.

Ballots are value-based: within a voter, a higher ``value_col`` means
more preferred.  Duplicate (voter, item) cells collapse with ``max``
(deterministic, the L190 discipline).

L391 — Borda count: an item's points from one voter = the number of
items that voter ranked BELOW it, average-rank style under ties.
The L146 doubled-rank trick keeps everything exact: with doubled
average rank 2r̄ (ascending by value), doubled points 2p = 2r̄ − 2,
and the group score is the EXACT integer Σ_voters 2p — ``borda`` is
the one halving division, ``rank`` orders by the exact doubled sum
(item ASC tiebreak, deterministic).  Classical Borda is defined on
COMPLETE ballots: voters who did not rank every item in the group
are DROPPED (the L190 incomplete-block convention, documented;
``n_voters`` reports the survivors).

L392 — Copeland / Condorcet: for each item pair, count voters
preferring each side (strict value inequality; within-ballot ties
count for neither).  beats/losses/ties_pw per item follow from the
pairwise win matrix; Copeland = beats − losses (exact integers, no
division at all); ``is_condorcet`` marks an item that beats ALL
k−1 others (a never-compared pair is NOT a beat — partial-ballot
semantics, documented).  Unlike Borda, partial ballots PARTICIPATE:
a pair is scored by every voter who ranked both sides.

Scale shape: Borda = one cell groupBy + one high-cardinality
(keys, voter) window + one combinable agg — the L190 shape.
Copeland = one cell groupBy + a self-join on (keys, voter) whose
fan-out is bounded by the per-ballot width (``max_ballot``, REFUSED
loudly beyond — the L362 basket-width bound) + two combinable aggs.
Voters shard the shuffle key space; 100 TB of ballots is many
voters, never one giant one.

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

_DEC = "decimal(38,0)"


def _cells(
    df: DataFrame, by: list[str], voter_col: str, item_col: str, value_col: str
) -> DataFrame:
    return (
        df.filter(
            F.col(voter_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(
            *by,
            F.col(voter_col).alias("_voter"),
            F.col(item_col).alias("_item"),
        )
        .agg(F.max(value_col).alias("_v"))
    )


def borda_count(
    df: DataFrame,
    by: list[str],
    voter_col: str,
    item_col: str,
    value_col: str,
) -> DataFrame:
    """``(by..., item, k, n_voters, borda, rank)`` — Borda count over
    complete ballots (see module docstring)."""
    cell = _cells(df, by, voter_col, item_col, value_col)
    kdf = cell.groupBy(*by).agg(F.countDistinct("_item").alias("k"))
    vs = cell.groupBy(*by, "_voter").agg(F.count(F.lit(1)).alias("_vc"))
    joined = cell.join(vs, [*by, "_voter"])
    full = (
        joined.join(F.broadcast(kdf), list(by))
        if by
        else joined.crossJoin(F.broadcast(kdf))
    )
    full = full.filter(F.col("_vc") == F.col("k"))
    wv = [*by, "_voter"]
    w_cum = (
        Window.partitionBy(*wv)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_eq = Window.partitionBy(*wv, "_v")
    # doubled points: 2p = 2r̄ − 2 = 2·cum − eq − 1
    ranked = full.withColumn(
        "_2p",
        (
            F.lit(2) * F.count(F.lit(1)).over(w_cum)
            - F.count(F.lit(1)).over(w_eq)
            - F.lit(1)
        ).cast(_DEC),
    )
    agg = ranked.groupBy(*by, "k", F.col("_item").alias("item")).agg(
        F.countDistinct("_voter").alias("n_voters"),
        F.sum("_2p").alias("_s2"),
    )
    w_rank = Window.partitionBy(*by).orderBy(
        F.col("_s2").desc(), F.col("item").asc()
    )
    return agg.select(
        *by,
        "item",
        "k",
        "n_voters",
        (F.col("_s2").cast("double") / F.lit(2.0)).alias("borda"),
        F.row_number().over(w_rank).alias("rank"),
    )


def copeland_pairwise(
    df: DataFrame,
    by: list[str],
    voter_col: str,
    item_col: str,
    value_col: str,
    max_ballot: int = 64,
) -> DataFrame:
    """``(by..., item, k, beats, losses, ties_pw, copeland,
    is_condorcet)`` — Copeland scores + Condorcet winner flag from
    the pairwise majority matrix (see module docstring)."""
    cell = _cells(df, by, voter_col, item_col, value_col)
    if validation_enabled():
        wide = (
            cell.groupBy(*by, "_voter")
            .agg(F.count(F.lit(1)).alias("_vc"))
            .filter(F.col("_vc") > max_ballot)
            .count()
        )
        if wide:
            raise ValueError(
                f"copeland_pairwise: {wide} ballot(s) wider than "
                f"max_ballot={max_ballot} — the pair self-join is "
                "quadratic in ballot width; raise the cap deliberately"
            )
    a = cell.select(*by, "_voter", F.col("_item").alias("_ia"), F.col("_v").alias("_va"))
    b = cell.select(*by, "_voter", F.col("_item").alias("_ib"), F.col("_v").alias("_vb"))
    pairs = (
        a.join(b, [*by, "_voter"])
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy(*by, "_ia", "_ib")
        .agg(
            F.sum(
                F.when(F.col("_va") > F.col("_vb"), 1).otherwise(0)
            ).alias("_wa"),
            F.sum(
                F.when(F.col("_vb") > F.col("_va"), 1).otherwise(0)
            ).alias("_wb"),
        )
    )
    sides = pairs.select(
        *by,
        F.col("_ia").alias("item"),
        F.col("_wa").alias("_w"),
        F.col("_wb").alias("_l"),
    ).unionByName(
        pairs.select(
            *by,
            F.col("_ib").alias("item"),
            F.col("_wb").alias("_w"),
            F.col("_wa").alias("_l"),
        )
    )
    kdf = cell.groupBy(*by).agg(F.countDistinct("_item").alias("k"))
    per = sides.groupBy(*by, "item").agg(
        F.sum(F.when(F.col("_w") > F.col("_l"), 1).otherwise(0)).alias(
            "beats"
        ),
        F.sum(F.when(F.col("_w") < F.col("_l"), 1).otherwise(0)).alias(
            "losses"
        ),
        F.sum(F.when(F.col("_w") == F.col("_l"), 1).otherwise(0)).alias(
            "ties_pw"
        ),
    )
    out = (
        per.join(F.broadcast(kdf), list(by))
        if by
        else per.crossJoin(F.broadcast(kdf))
    )
    return out.select(
        *by,
        "item",
        "k",
        "beats",
        "losses",
        "ties_pw",
        (F.col("beats") - F.col("losses")).alias("copeland"),
        (F.col("beats") == (F.col("k") - 1)).alias("is_condorcet"),
    )
