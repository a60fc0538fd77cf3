"""Highest-averages apportionment (L399): D'Hondt / Sainte-Laguë
seat allocation — proportional division of an integer budget across
parties by vote share (parliaments, but equally shard-count
allocation across tenants, sample-budget allocation across strata,
GPU-hour allocation across teams — any "integer seats from
continuous weights" problem where largest-remainder methods
paradox).

Method: every party generates ``total_seats`` quotients
vₚ/d(i), i = 1..S with divisors

    dhondt:       d(i) = i
    sainte_lague: d(i) = 2i − 1

and the S largest quotients take the seats.  The ranking key is the
IEEE quotient (the SAME division in both engines — bit-identical)
with the (party ASC, i ASC) tiebreak pinned, so allocation is
deterministic cross-engine even at exact quotient collisions (two
parties with equal votes, or 2:1 vote ratios under D'Hondt).

Zero-vote parties get zero seats without generating quotients;
negative votes are REFUSED, as are duplicate (group, party) rows
(each would spawn its own divisor ladder and double-weight the
party — pre-aggregate votes first).  ``total_seats`` is bounded by
``max_seats`` (the quotient explode is |parties|·S — REFUSED loudly
beyond).  Output carries votes and exact seat counts per party
(parties with zero seats INCLUDED — an allocation table with missing
rows misreads as data loss).

Scale shape: one bounded explode + one ranking window per group +
one combinable count — groups (elections/budget rounds) parallelize.

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def highest_averages(
    df: DataFrame,
    by: list[str],
    party_col: str,
    votes_col: str,
    total_seats: int,
    method: str = "dhondt",
    max_seats: int = 10_000,
) -> DataFrame:
    """``(by..., party, votes, seats)`` — see module docstring."""
    if method not in ("dhondt", "sainte_lague"):
        raise ValueError(f"highest_averages: unknown method {method!r}")
    if not (1 <= total_seats <= max_seats):
        raise ValueError(
            f"highest_averages: total_seats must be in 1..{max_seats}"
        )
    base = df.filter(F.col(votes_col).isNotNull()).select(
        *by,
        F.col(party_col).alias("party"),
        F.col(votes_col).alias("votes"),
    )
    from .validate import validation_enabled

    if validation_enabled():
        n_neg = base.filter(F.col("votes") < 0).count()
        if n_neg:
            raise ValueError(
                f"highest_averages: {n_neg} negative vote count(s)"
            )
        # duplicate (by, party) rows would each spawn a full divisor
        # ladder, silently double-weighting that party — refuse loudly
        # like the sibling duplicate guards (rrf_fusion, quade_test)
        if validation_enabled():
            dup = (
                base.groupBy(*by, "party")
                .count()
                .filter(F.col("count") > 1)
                .count()
            )
            if dup:
                raise ValueError(
                    f"highest_averages: {dup} duplicate (group, party) "
                    "row(s) — pre-aggregate votes per party first"
                )
    pos = base.filter(F.col("votes") > 0)
    idx = F.explode(
        F.sequence(F.lit(1), F.lit(int(total_seats)))
    ).alias("_i")
    quot = pos.select(*by, "party", "votes", idx)
    div = (
        F.col("_i").cast("double")
        if method == "dhondt"
        else (F.lit(2) * F.col("_i") - F.lit(1)).cast("double")
    )
    quot = quot.withColumn(
        "_q", F.col("votes").cast("double") / div
    )
    w = Window.partitionBy(*by).orderBy(
        F.col("_q").desc(), F.col("party").asc(), F.col("_i").asc()
    )
    seats = (
        quot.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= total_seats)
        .groupBy(*by, "party")
        .agg(F.count(F.lit(1)).alias("seats"))
    )
    out = base.join(seats, [*by, "party"], "left")
    return out.select(
        *by,
        "party",
        "votes",
        F.coalesce(F.col("seats"), F.lit(0)).alias("seats"),
    )
