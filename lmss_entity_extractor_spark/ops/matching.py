"""Two-sided market operators (L403/L404): Gale-Shapley stable
matching and uniform-price auction clearing — assignment analytics
(reviewer-to-paper, task-to-worker, ad-slot and batch-auction
allocation) built on the engine's fixpoint and window disciplines.

L403 — stable matching (Gale & Shapley 1962, deferred acceptance,
proposer-optimal).  Input is the ACCEPTABLE-pair table: one row per
(proposer, acceptor) both sides would tolerate, carrying each side's
preference value (higher = more preferred).  Preference order is
pinned to (value DESC, partner-id ASC) — a strict total order, so the
proposer-optimal matching is UNIQUE and deterministic even with tied
values.  The algorithm is the McVitie-Wilson round form, expressed in
the engine's L65/J4 fixpoint discipline:

    each round every unrejected proposer proposes to the best pair
    still open to them; each acceptor keeps the best proposal; the
    refused proposals are REMOVED from the pair table; repeat until
    no proposal is refused.  localCheckpoint flattens lineage; loud
    non-convergence after ``max_rounds`` (the round count is bounded
    by the pair count).

Matched pairs are emitted with both preference values; proposers
whose whole list rejected them are absent (documented — a LEFT join
against the roster is the caller's report shape).  Scale: rounds are
two ranking windows + one anti-join over a table that only SHRINKS;
markets (groups) parallelize inside every round.

L404 — uniform-price auction clearing: bids (price, qty) against a
fixed ``supply``; the clearing price is the lowest accepted bid's
price when demand is ranked (price DESC, bidder ASC — pinned);
winning bids receive full quantity above the margin and an EXACT
pro-rata share of the residual supply at the margin:

    alloc = qty                         above the clearing price
    alloc = qty · residual / margin_qty at the clearing price

with the marginal fraction computed as one division of exact decimal
integers per bid.  Undersubscribed auctions (demand < supply) clear every bid at
full quantity with a NULL clearing price (no binding margin —
documented); demand = supply binds at the lowest accepted price.
One window sort per auction; exact cumulative sums.

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def stable_matching(
    pairs: DataFrame,
    by: list[str],
    proposer_col: str,
    acceptor_col: str,
    p_value_col: str,
    a_value_col: str,
    max_rounds: int = 200,
) -> DataFrame:
    """``(by..., proposer, acceptor, p_value, a_value)`` — the unique
    proposer-optimal stable matching (see module docstring)."""
    base = (
        pairs.filter(
            F.col(proposer_col).isNotNull()
            & F.col(acceptor_col).isNotNull()
            & F.col(p_value_col).isNotNull()
            & F.col(a_value_col).isNotNull()
        )
        .select(
            *by,
            F.col(proposer_col).alias("proposer"),
            F.col(acceptor_col).alias("acceptor"),
            F.col(p_value_col).alias("p_value"),
            F.col(a_value_col).alias("a_value"),
        )
        .groupBy(*by, "proposer", "acceptor")
        .agg(
            F.max("p_value").alias("p_value"),
            F.max("a_value").alias("a_value"),
        )
        .localCheckpoint()
    )
    w_p = Window.partitionBy(*by, "proposer").orderBy(
        F.col("p_value").desc(), F.col("acceptor").asc()
    )
    w_a = Window.partitionBy(*by, "acceptor").orderBy(
        F.col("a_value").desc(), F.col("proposer").asc()
    )
    live = base
    for _ in range(max_rounds):
        props = (
            live.withColumn("_rp", F.row_number().over(w_p))
            .filter(F.col("_rp") == 1)
            .drop("_rp")
        )
        kept = (
            props.withColumn("_ra", F.row_number().over(w_a))
            .filter(F.col("_ra") == 1)
            .drop("_ra")
        )
        refused = props.join(
            kept.select(*by, "proposer", "acceptor"),
            [*by, "proposer", "acceptor"],
            "left_anti",
        ).localCheckpoint()
        if refused.isEmpty():
            return kept
        live = live.join(
            refused.select(*by, "proposer", "acceptor"),
            [*by, "proposer", "acceptor"],
            "left_anti",
        ).localCheckpoint()
    raise RuntimeError(
        f"stable_matching did not converge within {max_rounds} "
        "rounds — raise max_rounds (bounded by the pair count)"
    )


def auction_clearing(
    bids: DataFrame,
    by: list[str],
    bidder_col: str,
    price_col: str,
    qty_col: str,
    supply: int,
    scale: int = 2,
) -> DataFrame:
    """``(by..., bidder, price, qty, alloc, clearing_price)`` —
    uniform-price allocation against a fixed supply (see module
    docstring)."""
    if supply < 1:
        raise ValueError("auction_clearing: supply must be >= 1")
    dec = f"decimal(18,{scale})"
    base = bids.filter(
        F.col(bidder_col).isNotNull()
        & F.col(price_col).isNotNull()
        & F.col(qty_col).isNotNull()
    ).select(
        *by,
        F.col(bidder_col).alias("bidder"),
        F.col(price_col).cast(dec).alias("price"),
        F.col(qty_col).cast("bigint").alias("qty"),
    )
    if validation_enabled():
        n_bad = base.filter(F.col("qty") <= 0).count()
        if n_bad:
            raise ValueError(
                f"auction_clearing: {n_bad} bid(s) with non-positive "
                "quantity"
            )
    w = Window.partitionBy(*by).orderBy(
        F.col("price").desc(), F.col("bidder").asc()
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = F.lit(int(supply))
    staged = base.select(
        *by,
        "bidder",
        "price",
        "qty",
        F.sum("qty").over(wc).alias("_cum"),
    )
    prev = F.col("_cum") - F.col("qty")
    # the marginal bid is the first one whose cumulative demand
    # reaches supply; bids strictly above take full quantity
    is_full = F.col("_cum") <= s
    is_marginal = (prev < s) & (F.col("_cum") > s)
    residual = s - prev
    alloc = (
        F.when(is_full, F.col("qty").cast("double"))
        .when(
            is_marginal,
            F.col("qty").cast("double")
            * (residual.cast("double") / F.col("qty").cast("double")),
        )
        .otherwise(F.lit(0.0))
    )
    w_all = Window.partitionBy(*by)
    clearing = F.min(
        F.when(prev < s, F.col("price"))
    ).over(w_all)
    total_demand = F.max("_cum").over(w_all)
    return staged.select(
        *by,
        "bidder",
        "price",
        "qty",
        alloc.alias("alloc"),
        F.when(total_demand >= s, clearing)
        .otherwise(F.lit(None).cast(dec))
        .alias("clearing_price"),
    )
