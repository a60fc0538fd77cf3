"""Sequential pairwise rating (L371): Elo ratings over an ordered
game log — the leaderboard primitive for head-to-head outcomes
(model A vs model B judgments, agent battles, matchmaking):

    E_a = 1/(1 + 10^((r_b − r_a)/400))
    r_a += K·(s − E_a),  r_b −= K·(s − E_a)     (s ∈ {1, ½, 0})

Elo is PATH-DEPENDENT — each update reads the ratings the previous
games left — so the rating pool is inherently a sequential fold, not
a combinable aggregation.  The repo's shape for that is the L333/L347
struct fold: per pool the game log collapses to ONE sorted array and
the ratings table is the accumulator — an array of (player, rating,
n_games) structs, each step rewriting exactly two slots (the
Holt-Winters seasonal-slot discipline).  10^x is spelled
exp(x·ln10) with ln10 pinned as a literal so both engines build the
same tree.

Bounds are the contract, loudly enforced: a pool is a LEADERBOARD
(players ≤ max_players, games ≤ max_games) — a pool too big to fold
in a row is an upstream modeling problem (shard by league/time), not
something to silently subsample.  Duplicate order keys are refused
(the fold order would be nondeterministic), as are self-games and
scores outside {0, ½, 1}.

Scale shape: one groupBy to pack each pool + one bounded in-row
fold; pools parallelize across the cluster — 100 TB of game logs is
many pools, not one giant one.

No reference counterpart; ranking analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

LN10 = 2.302585092994046


def elo_ratings(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    player_a_col: str,
    player_b_col: str,
    score_col: str,
    k_factor: float = 32.0,
    initial: float = 1500.0,
    max_players: int = 1000,
    max_games: int = 100_000,
) -> DataFrame:
    """``(by..., player, rating, n_games)`` — final Elo ratings after
    folding the pool's games in ``order_cols`` order.  ``score_col``
    is from player_a's side: 1 win, 0 loss, 0.5 draw."""
    cols = [player_a_col, player_b_col, score_col, *order_cols]
    null_pred = None
    for c in cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    if validation_enabled():
        n_null = df.filter(null_pred).count()
        if n_null:
            raise ValueError(f"elo_ratings: {n_null} NULL value(s)")
    if validation_enabled():
        n_bad = df.filter(
            ~F.col(score_col).cast("double").isin(0.0, 0.5, 1.0)
        ).count()
        if n_bad:
            raise ValueError(
                f"elo_ratings: {n_bad} score(s) outside {{0, 0.5, 1}}"
            )
    if validation_enabled():
        n_self = df.filter(
            F.col(player_a_col) == F.col(player_b_col)
        ).count()
        if n_self:
            raise ValueError(f"elo_ratings: {n_self} self-game(s)")
    if validation_enabled():
        n_duporder = (
            df.groupBy(*by, *order_cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_duporder:
            raise ValueError(
                f"elo_ratings: {n_duporder} duplicate order key(s) — the "
                "fold order would be nondeterministic"
            )

    g = df.select(
        *by,
        *order_cols,
        F.col(player_a_col).cast("string").alias("_a"),
        F.col(player_b_col).cast("string").alias("_b"),
        F.col(score_col).cast("double").alias("_s"),
    )
    if validation_enabled():
        over_games = (
            g.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > max_games)
            .count()
        )
        if over_games:
            raise ValueError(
                f"elo_ratings: a pool exceeds max_games={max_games} — "
                "shard the pool (league/season), don't subsample silently"
            )
    players = (
        g.select(*by, F.col("_a").alias("_p"))
        .unionByName(g.select(*by, F.col("_b").alias("_p")))
        .distinct()
    )
    if validation_enabled():
        over_players = (
            players.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > max_players)
            .count()
        )
        if over_players:
            raise ValueError(
                f"elo_ratings: a pool exceeds max_players={max_players}"
            )
    roster = players.groupBy(*by).agg(
        F.transform(
            F.sort_array(F.collect_list("_p")),
            lambda p: F.struct(
                p.alias("p"),
                F.lit(float(initial)).alias("r"),
                F.lit(0).cast("long").alias("n"),
            ),
        ).alias("_roster")
    )
    games = g.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    F.col("_a"),
                    F.col("_b"),
                    F.col("_s"),
                )
            )
        ).alias("_games")
    )
    packed = (
        roster.join(games, by) if by else roster.crossJoin(games)
    )

    kf = F.lit(float(k_factor))

    def _step(acc, gm):
        ra = F.element_at(
            F.filter(acc, lambda e: e["p"] == gm["_a"]), 1
        )["r"]
        rb = F.element_at(
            F.filter(acc, lambda e: e["p"] == gm["_b"]), 1
        )["r"]
        ea = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp((rb - ra) / F.lit(400.0) * F.lit(LN10))
        )
        d = kf * (gm["_s"] - ea)
        return F.transform(
            acc,
            lambda e: F.when(
                e["p"] == gm["_a"],
                F.struct(
                    e["p"].alias("p"),
                    (e["r"] + d).alias("r"),
                    (e["n"] + F.lit(1).cast("long")).alias("n"),
                ),
            )
            .when(
                e["p"] == gm["_b"],
                F.struct(
                    e["p"].alias("p"),
                    (e["r"] - d).alias("r"),
                    (e["n"] + F.lit(1).cast("long")).alias("n"),
                ),
            )
            .otherwise(e),
        )

    folded = packed.select(
        *by,
        F.aggregate(F.col("_games"), F.col("_roster"), _step).alias(
            "_final"
        ),
    )
    ex = folded.select(*by, F.explode(F.col("_final")).alias("_e"))
    return ex.select(
        *by,
        F.col("_e")["p"].alias("player"),
        F.col("_e")["r"].alias("rating"),
        F.col("_e")["n"].alias("n_games"),
    )


def bradley_terry(
    df: DataFrame,
    by: list[str],
    player_a_col: str,
    player_b_col: str,
    wins_a_col: str,
    wins_b_col: str,
    iters: int = 50,
    max_players: int = 256,
    max_pairs: int = 8192,
) -> DataFrame:
    """Bradley-Terry strengths (L407): ``(by..., player, wins, games,
    strength, rank)`` — the MODEL-BASED leaderboard from pairwise
    outcomes (LLM-judge A/B battles, chatbot-arena style): P(i beats
    j) = πᵢ/(πᵢ+πⱼ), fitted by Hunter-2004 MM iterations

        πᵢ ← Wᵢ / Σ_{j≠i} nᵢⱼ/(πᵢ+πⱼ),  then normalize Σπ = 1

    — unlike Elo (L371, path-dependent: the order of games changes
    the answer) BT is ORDER-FREE: only the pairwise win counts
    matter, so the fit is invariant to log ordering and arrival
    (pinned by test against L371's path dependence).

    The engine shape: outcomes aggregate to unordered-pair win counts
    (orientation normalized via least/greatest — one combinable
    groupBy), each pool packs a sorted roster and an (ia, ib)-indexed
    pair array, and the MM runs as ONE in-row fold over a FIXED
    ``iters`` count (no float stopping rule — the L28/L347
    discipline) with O(1) opponent lookups via roster indices; the
    normalization sum folds in roster order (pinned).  Pools are
    bounded loudly (``max_players``/``max_pairs``).

    Existence (Ford 1957): the MLE requires every player to both win
    and lose at least once — violating players are REFUSED loudly
    (their πᵢ iterates to 0/∞ and poisons the pool; comparison-graph
    connectivity beyond that is the caller's modeling duty,
    documented).  ``strength`` sums to 1 per pool; ``rank`` orders by
    (strength DESC, player ASC), deterministic.

    No reference counterpart; ranking analytics per SURVEY §2.11."""
    if iters < 1:
        raise ValueError("bradley_terry: iters must be >= 1")
    flt = df.filter(
        F.col(player_a_col).isNotNull()
        & F.col(player_b_col).isNotNull()
        & F.col(wins_a_col).isNotNull()
        & F.col(wins_b_col).isNotNull()
    )
    if validation_enabled():
        n_self = flt.filter(
            F.col(player_a_col) == F.col(player_b_col)
        ).count()
        if n_self:
            raise ValueError(f"bradley_terry: {n_self} self-pair row(s)")
    lo = F.least(
        F.col(player_a_col).cast("string"),
        F.col(player_b_col).cast("string"),
    )
    hi = F.greatest(
        F.col(player_a_col).cast("string"),
        F.col(player_b_col).cast("string"),
    )
    a_is_lo = F.col(player_a_col).cast("string") == lo
    pairs = (
        flt.select(
            *by,
            lo.alias("_a"),
            hi.alias("_b"),
            F.when(a_is_lo, F.col(wins_a_col))
            .otherwise(F.col(wins_b_col))
            .cast("double")
            .alias("_wa"),
            F.when(a_is_lo, F.col(wins_b_col))
            .otherwise(F.col(wins_a_col))
            .cast("double")
            .alias("_wb"),
        )
        .groupBy(*by, "_a", "_b")
        .agg(F.sum("_wa").alias("_wa"), F.sum("_wb").alias("_wb"))
    )
    if validation_enabled():
        over_pairs = (
            pairs.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > max_pairs)
            .count()
        )
        if over_pairs:
            raise ValueError(
                f"bradley_terry: a pool exceeds max_pairs={max_pairs}"
            )
    per_player = (
        pairs.select(
            *by,
            F.col("_a").alias("_p"),
            F.col("_wa").alias("_w"),
            F.col("_wb").alias("_l"),
        )
        .unionByName(
            pairs.select(
                *by,
                F.col("_b").alias("_p"),
                F.col("_wb").alias("_w"),
                F.col("_wa").alias("_l"),
            )
        )
        .groupBy(*by, "_p")
        .agg(F.sum("_w").alias("_w"), F.sum("_l").alias("_l"))
    )
    if validation_enabled():
        bad = per_player.filter(
            (F.col("_w") <= 0) | (F.col("_l") <= 0)
        ).count()
        if bad:
            raise ValueError(
                f"bradley_terry: {bad} player(s) with zero wins or zero "
                "losses — the BT MLE does not exist (Ford 1957); merge "
                "or drop them upstream"
            )
    if validation_enabled():
        over_players = (
            per_player.groupBy(*by)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > max_players)
            .count()
        )
        if over_players:
            raise ValueError(
                f"bradley_terry: a pool exceeds max_players={max_players}"
            )
    roster = per_player.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct("_p", "_w", "_l"))
        ).alias("_roster")
    )
    packed0 = pairs.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct("_a", "_b", "_wa", "_wb"))
        ).alias("_pairs")
    )
    joined = (
        packed0.join(roster, list(by))
        if by
        else packed0.crossJoin(roster)
    )
    names = F.transform(F.col("_roster"), lambda e: e["_p"])
    pidx = F.transform(
        F.col("_pairs"),
        lambda pr: F.struct(
            F.array_position(names, pr["_a"]).alias("ia"),
            F.array_position(names, pr["_b"]).alias("ib"),
            (pr["_wa"] + pr["_wb"]).alias("g"),
        ),
    )
    staged = joined.select(
        *by, F.col("_roster").alias("_r0"), pidx.alias("_pi")
    )
    init = F.transform(
        F.col("_r0"),
        lambda e: F.struct(
            e["_p"].alias("p"),
            e["_w"].alias("w"),
            e["_l"].alias("l"),
            F.lit(1.0).alias("r"),
        ),
    )

    def _step(acc, _i):
        def denom(e, idx):
            return F.aggregate(
                F.col("_pi"),
                F.lit(0.0),
                lambda s, pr: s
                + F.when(
                    pr["ia"] == idx + 1,
                    pr["g"]
                    / (e["r"] + F.element_at(acc, pr["ib"].cast("int"))["r"]),
                )
                .when(
                    pr["ib"] == idx + 1,
                    pr["g"]
                    / (e["r"] + F.element_at(acc, pr["ia"].cast("int"))["r"]),
                )
                .otherwise(F.lit(0.0)),
            )

        upd = F.transform(
            acc,
            lambda e, idx: F.struct(
                e["p"].alias("p"),
                e["w"].alias("w"),
                e["l"].alias("l"),
                (e["w"] / denom(e, idx)).alias("r"),
            ),
        )
        tot = F.aggregate(
            upd, F.lit(0.0), lambda s, e: s + e["r"]
        )
        return F.transform(
            upd,
            lambda e: F.struct(
                e["p"].alias("p"),
                e["w"].alias("w"),
                e["l"].alias("l"),
                (e["r"] / tot).alias("r"),
            ),
        )

    folded = staged.select(
        *by,
        F.aggregate(
            F.sequence(F.lit(1), F.lit(int(iters))), init, _step
        ).alias("_final"),
    )
    ex = folded.select(*by, F.explode("_final").alias("_e"))
    w_rank = Window.partitionBy(*by).orderBy(
        F.col("_e")["r"].desc(), F.col("_e")["p"].asc()
    )
    return ex.select(
        *by,
        F.col("_e")["p"].alias("player"),
        F.col("_e")["w"].alias("wins"),
        (F.col("_e")["w"] + F.col("_e")["l"]).alias("games"),
        F.col("_e")["r"].alias("strength"),
        F.row_number().over(w_rank).alias("rank"),
    )
