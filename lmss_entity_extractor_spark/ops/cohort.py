"""Cohort retention and ordered funnel analysis (L114): the two
product-analytics queries every event warehouse answers daily,
expressed so each is a fixed number of keyed exchanges regardless of
input size.

``cohort_retention`` — assign each user to the period of their FIRST
activity (epoch-aligned buckets, the gap-fill grid discipline), then
count distinct users active at each offset from their cohort:

    one window min over user (keyed exchange #1)
    → distinct (user, cohort, offset)
    → count per (cohort, offset) + cohort-size window (exchange #2)

Retention is an exact integer ratio published as ``n_active`` and
``retention`` (n_active / cohort size at offset 0 — offset 0 is 1.0 by
construction since every user is active in their cohort period).

``funnel`` — strict ordered-step completion within a horizon: a user
completes step i at the EARLIEST event of step i that is strictly
after their step-(i-1) completion (and within ``horizon_seconds`` of
step 0).  The textbook formulation is a chain of self-joins; here each
user's events collapse to ONE sorted array and the step chain is a
single JVM higher-order ``aggregate`` fold over it (state = (next step
index, last completion time)) — no UDF, no per-step shuffle, ONE keyed
exchange total.  Per-user event counts bound the array (the sessionize
assumption; a user with millions of events is an upstream bug —
``max_events_per_user`` guards loudly).

Both are value-oracle-able: the fold is deterministic (array sorted by
(ts, step) with a total tie-break) and the oracle re-derives the chain
as sequential conditional-min joins.

No reference counterpart; events-table analytics belong to the
beyond-reference training-pipeline mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from .validate import validation_enabled


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """``(cohort_period timestamp, offset int, n_active long,
    retention double)`` — distinct users active ``offset`` periods
    after their first-activity period."""
    if period_seconds <= 0:
        raise ValueError(f"period_seconds must be positive, got {period_seconds}")
    for c in (user_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / period_seconds) * period_seconds
    ).cast("long")
    ev = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), bucket.alias("p"))
        .distinct()
    )
    w = Window.partitionBy("u")
    offs = ev.select(
        "u",
        F.min("p").over(w).alias("cohort_p"),
        ((F.col("p") - F.min("p").over(w)) / period_seconds).cast("int").alias("offset"),
    )
    base = Window.partitionBy("cohort_p")
    counts = offs.groupBy("cohort_p", "offset").agg(
        F.count_distinct("u").alias("n_active")
    )
    cohort_size = F.max(
        F.when(F.col("offset") == 0, F.col("n_active"))
    ).over(base)
    return counts.select(
        F.timestamp_seconds("cohort_p").alias("cohort_period"),
        "offset",
        "n_active",
        F.round(F.col("n_active") / cohort_size, 6).alias("retention"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
    horizon_seconds: int | None = None,
    max_events_per_user: int = 100_000,
) -> DataFrame:
    """Strict ordered funnel: ``(steps_completed int, n_users long)``
    for 0..len(steps) — how many users got exactly k steps deep, each
    step strictly after the previous, all within ``horizon_seconds``
    of their step-0 completion (None = unbounded)."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be a non-empty list of distinct step names")
    for c in (user_col, ts_col, step_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    mapping = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    ev = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            F.unix_timestamp(F.col(ts_col)).alias("t"),
            F.element_at(mapping, F.col(step_col)).alias("s"),
        )
        .filter(F.col("s").isNotNull())
    )
    per_user = ev.groupBy("u").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.array_sort(F.collect_list(F.struct("t", "s"))).alias("evs"),
    )
    guard = F.when(
        F.col("n_ev") > max_events_per_user,
        F.raise_error(
            F.concat(
                F.lit(
                    f"funnel: user exceeds max_events_per_user={max_events_per_user}: "
                ),
                F.col("u").cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.lit(0))

    horizon = F.lit(-1 if horizon_seconds is None else int(horizon_seconds)).cast(
        "long"
    )
    n_steps = len(steps)
    # fold state: (next step index to complete, t0 = step-0 time, tprev)
    fold = F.aggregate(
        F.col("evs"),
        F.struct(
            F.lit(0).alias("nxt"),
            F.lit(-1).cast("long").alias("t0"),
            F.lit(-9223372036854775808).alias("tprev"),
        ),
        lambda acc, e: F.when(
            (acc["nxt"] < n_steps)
            & (e["s"] == acc["nxt"])
            & (e["t"] > acc["tprev"])
            & ((acc["nxt"] == 0) | (horizon < 0) | (e["t"] - acc["t0"] <= horizon)),
            F.struct(
                (acc["nxt"] + 1).alias("nxt"),
                F.when(acc["nxt"] == 0, e["t"]).otherwise(acc["t0"]).alias("t0"),
                e["t"].alias("tprev"),
            ),
        ).otherwise(acc),
    )
    depth = per_user.select((fold["nxt"] + guard).alias("steps_completed"))
    counts = depth.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    grid = df.sparkSession.range(0, n_steps + 1).select(
        F.col("id").cast("int").alias("steps_completed")
    )
    return grid.join(counts, "steps_completed", "left").select(
        "steps_completed",
        F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias("n_users"),
    )


def rfm_scores(
    df: DataFrame,
    by: list[str],
    id_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 5,
    scale: int = 2,
) -> DataFrame:
    """``(by..., id, recency_days, frequency, monetary, r_score,
    f_score, m_score, rfm)`` — RFM quintile scoring (L337): the
    classic customer-value segmentation — how RECENTLY, how OFTEN,
    how MUCH — as deterministic rank bins:

        score = ⌈bins·rank/n⌉, ranks ordered worst→best with the id
        as the tiebreak (ntile's arbitrary tie placement would make
        boundary customers flip between runs — refused by design)

    Recency is measured against the LATEST event in the data (a
    deterministic reference, not wall-clock "now"); frequency and
    monetary are exact counts/decimal sums.  ``rfm`` concatenates the
    three digits ("555" = best).

    Scale shape: one combinable (keys, id) agg + three keyed window
    passes over the per-id table (already aggregate-sized).

    No reference counterpart; customer analytics per SURVEY §2.11.
    """
    if n_bins < 2:
        raise ValueError("rfm_scores: n_bins must be >= 2")
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(id_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(amount_col).isNotNull()
    )
    per_id = flt.groupBy(*by, F.col(id_col).alias("id")).agg(
        F.max(F.to_date(ts_col)).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast(dec)).alias("_mon"),
    )
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per_id.select(
        *by,
        "id",
        F.datediff(F.max("_last").over(wa), F.col("_last")).alias(
            "recency_days"
        ),
        "frequency",
        F.col("_mon").cast("double").alias("monetary"),
        F.col("_mon").alias("_mond"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    bins = F.lit(int(n_bins))

    def score(order_cols):
        w = Window.partitionBy(*by).orderBy(*order_cols)
        rn = F.row_number().over(w)
        return F.ceil(bins * rn / F.col("_n")).cast("int")

    out = staged.select(
        *by,
        "id",
        "recency_days",
        "frequency",
        "monetary",
        score([F.desc("recency_days"), F.asc("id")]).alias("r_score"),
        score([F.asc("frequency"), F.asc("id")]).alias("f_score"),
        score([F.asc("_mond"), F.asc("id")]).alias("m_score"),
    )
    return out.select(
        *by,
        "id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm"),
    )


def weekday_profile(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """``(by..., dow, n, mean, idx)`` — day-of-week profile (L361):
    the seasonality fingerprint every operational dashboard opens
    with — mean metric per weekday and its INDEX against the overall
    mean (idx 1.3 = "Mondays run 30% hot"), the multiplicative
    factors a weekday-naive forecast divides out:

        mean(dow) = Σ_dow x / n_dow,   idx = mean(dow) / mean(all)

    Sums are exact decimals; each output is at most two IEEE
    divisions in a pinned order.  dow follows Spark's ``dayofweek``
    convention (1 = Sunday … 7 = Saturday).  NULL values or
    timestamps refused; a zero overall mean → NULL idx (a ratio
    against nothing).

    Scale shape: one combinable agg + one broadcast totals join.

    No reference counterpart; seasonal analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(value_col).isNull() | F.col(ts_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"weekday_profile: {n_null} NULL value(s) — impute first"
            )
    dec = f"decimal(18,{scale})"
    staged = df.select(
        *by,
        F.dayofweek(F.col(ts_col)).alias("dow"),
        F.col(value_col).cast(dec).alias("_x"),
    )
    per_dow = staged.groupBy(*by, "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_s"),
    )
    totals = staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_nt"),
        F.sum("_x").alias("_st"),
    )
    joined = (
        per_dow.join(F.broadcast(totals), by)
        if by
        else per_dow.crossJoin(F.broadcast(totals))
    )
    mean = F.col("_s").cast("double") / F.col("n").cast("double")
    overall = F.col("_st").cast("double") / F.col("_nt").cast("double")
    return joined.select(
        *by,
        "dow",
        "n",
        mean.alias("mean"),
        F.when(overall != 0.0, mean / overall).alias("idx"),
    )


def multitouch_attribution(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    channel_col: str,
    model: str = "linear",
    max_path: int = 100,
) -> DataFrame:
    """``(channel, n_touches, credit)`` — multi-touch attribution
    (L363): distribute each conversion's single unit of credit across
    the channels that touched it, under the four standard positional
    models (the upgrades of L123's last-touch):

        linear    1/n each
        first     all to the first touch
        last      all to the last touch
        u_shaped  0.4 first + 0.4 last + 0.2/(n−2) middles
                  (n=1 → 1;  n=2 → 0.5/0.5)

    Exactness: touches collapse to (channel, n, pos-class) CELLS with
    exact integer counts, and each channel's credit folds over its
    OWN sorted cell list — deterministic order, bounded by
    ``max_path`` (longer journeys refused loudly: a 10⁴-touch "path"
    is a tracking bug, not a journey).  Per-cell weights are fixed
    IEEE trees in n.  NULL channels/conversions refused.

    Scale shape: one rank window per conversion + one cell groupBy +
    one bounded per-channel fold.

    No reference counterpart; marketing analytics per SURVEY §2.11.
    """
    if model not in ("linear", "first", "last", "u_shaped"):
        raise ValueError(
            f"multitouch_attribution: unknown model {model!r}"
        )
    if validation_enabled():
        n_null = df.filter(
            F.col(conv_col).isNull() | F.col(channel_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"multitouch_attribution: {n_null} NULL value(s)"
            )
    wt = Window.partitionBy(conv_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wa = Window.partitionBy(conv_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        F.col(channel_col).alias("channel"),
        F.row_number().over(wt).alias("_pos"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    if validation_enabled():
        over = ranked.filter(F.col("_n") > max_path).count()
        if over:
            raise ValueError(
                f"multitouch_attribution: {over} touch row(s) in paths "
                f"longer than max_path={max_path} — fix tracking or bound "
                "the journey window"
            )
    # position class: 1 = first, 2 = middle, 3 = last; n=1 -> class 0
    cls = (
        F.when(F.col("_n") == 1, F.lit(0))
        .when(F.col("_pos") == 1, F.lit(1))
        .when(F.col("_pos") == F.col("_n"), F.lit(3))
        .otherwise(F.lit(2))
    )
    cells = ranked.groupBy(
        "channel", F.col("_n").alias("_nn"), cls.alias("_cls")
    ).agg(F.count(F.lit(1)).alias("_c"))
    packed = cells.groupBy("channel").agg(
        F.sort_array(
            F.collect_list(F.struct("_nn", "_cls", "_c"))
        ).alias("_a"),
        F.sum("_c").alias("n_touches"),
    )
    zero = F.lit(0.0)

    def weight(el):
        nd = el["_nn"].cast("double")
        c = el["_cls"]
        one, half = F.lit(1.0), F.lit(0.5)
        if model == "linear":
            return one / nd
        if model == "first":
            return (
                F.when(c == 0, one)
                .when(c == 1, one)
                .otherwise(zero)
            )
        if model == "last":
            return (
                F.when(c == 0, one)
                .when(c == 3, one)
                .otherwise(zero)
            )
        # u_shaped
        return (
            F.when(c == 0, one)
            .when(
                (c == 1) | (c == 3),
                F.when(el["_nn"] == 2, half).otherwise(F.lit(0.4)),
            )
            .otherwise(F.lit(0.2) / (nd - F.lit(2.0)))
        )

    def step(acc, el):
        return acc + el["_c"].cast("double") * weight(el)

    credit = F.aggregate(F.col("_a"), zero, step)
    return packed.select(
        "channel", "n_touches", credit.alias("credit")
    )


def qini_deciles(
    df: DataFrame,
    by: list[str],
    id_col: str,
    score_col: str,
    treated_col: str,
    converted_col: str,
) -> DataFrame:
    """``(by..., decile, nt, nc, yt, yc, uplift, qini)`` — Qini /
    uplift deciles (L364): does a targeting model rank persuadable
    units first — the experiment-grade upgrade of L207's gains table
    (which a response model can ace while targeting sure things):

        rank by score DESC (id tiebreak), decile = ⌈10·rank/n⌉
        uplift_k = Yt/Nt − Yc/Nc           (within-decile, cumulative)
        qini_k   = Yt − Yc·(Nt/Nc)          (cumulative, in units)

    Every count is an exact cumulative integer (one rank window + one
    decile groupBy + one ordered cumsum window over ≤10 rows per
    key); each output is one fixed IEEE tree.  Deciles with no
    control (or no treated) units so far → NULL uplift/qini.
    treated/converted must be 0/1; NULLs refused.

    Scale shape: one rank window + one 10-row-per-key window.

    No reference counterpart; experiment analytics per SURVEY §2.11.
    """
    if validation_enabled():
        n_null = df.filter(
            F.col(score_col).isNull()
            | F.col(treated_col).isNull()
            | F.col(converted_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"qini_deciles: {n_null} NULL value(s)")
    if validation_enabled():
        n_bad = df.filter(
            ~F.col(treated_col).cast("int").isin(0, 1)
            | ~F.col(converted_col).cast("int").isin(0, 1)
        ).count()
        if n_bad:
            raise ValueError(
                f"qini_deciles: {n_bad} non-0/1 treated/converted value(s)"
            )
    wt = Window.partitionBy(*by).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wa = Window.partitionBy(*by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.select(
        *by,
        F.col(treated_col).cast("long").alias("_t"),
        F.col(converted_col).cast("long").alias("_y"),
        F.row_number().over(wt).alias("_r"),
        F.count(F.lit(1)).over(wa).alias("_n"),
    )
    decile = F.ceil(
        F.col("_r") * F.lit(10) / F.col("_n")
    ).cast("int")
    per = ranked.groupBy(*by, decile.alias("decile")).agg(
        F.sum("_t").alias("_dt"),
        F.sum(F.lit(1) - F.col("_t")).alias("_dc"),
        F.sum(F.col("_t") * F.col("_y")).alias("_dyt"),
        F.sum((F.lit(1) - F.col("_t")) * F.col("_y")).alias("_dyc"),
    )
    wc = Window.partitionBy(*by).orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        *by,
        "decile",
        F.sum("_dt").over(wc).alias("nt"),
        F.sum("_dc").over(wc).alias("nc"),
        F.sum("_dyt").over(wc).alias("yt"),
        F.sum("_dyc").over(wc).alias("yc"),
    )
    ntd = F.col("nt").cast("double")
    ncd = F.col("nc").cast("double")
    ytd = F.col("yt").cast("double")
    ycd = F.col("yc").cast("double")
    ok = (F.col("nt") > 0) & (F.col("nc") > 0)
    return cum.select(
        *by,
        "decile",
        "nt",
        "nc",
        "yt",
        "yc",
        F.when(ok, ytd / ntd - ycd / ncd).alias("uplift"),
        F.when(ok, ytd - ycd * (ntd / ncd)).alias("qini"),
    )


def markov_attribution(
    df: DataFrame,
    by: list[str],
    journey_col: str,
    order_col: str,
    channel_col: str,
    converted_col: str,
    n_steps: int = 32,
    max_channels: int = 32,
    max_journey: int = 256,
) -> DataFrame:
    """Markov removal-effect attribution (L418): ``(by..., channel,
    n_touches, base_p, removed_p, removal_effect, share)`` — the
    DATA-DRIVEN attribution model completing last-touch (L123,
    positional fiat) and multi-touch (L363, positional split): build
    the first-order journey chain START → channels → {CONV, NULL},
    and credit each channel by how much conversion DIES when it is
    removed (Anderl et al. 2014):

        base_p     = P(reach CONV from START)
        removed_p  = P(... with channel c's edges redirected to NULL)
        removal_effect = 1 − removed_p/base_p   (clamped ≥ 0)
        share      = removal_effect / Σ removal_effects

    Transition counts are exact integers (duplicate consecutive
    channels collapse is the CALLER's modeling choice — documented);
    probabilities are one division each; absorption runs as a FIXED
    ``n_steps`` truncated propagation (v ← P·v with CONV = 1 — the
    L28 no-float-stopping discipline, geometric convergence), one
    in-row fold per removal over the (ia, ib)-indexed transition
    array (the L407 machinery: O(1) lookups, pinned fold orders).
    Pools are bounded loudly (``max_channels``, ``max_journey``
    steps per journey); a journey's ``converted_col`` must be
    constant within the journey (a broken join, refused).  Zero
    base_p → NULL everything (no conversions to attribute).

    Scale shape: one keyed window building consecutive pairs, one
    combinable transition-count agg, then per-(by) bounded in-row
    folds — one fold per channel, channels ≤ max_channels.

    No reference counterpart; marketing analytics per SURVEY §2.11."""
    if n_steps < 1:
        raise ValueError("markov_attribution: n_steps must be >= 1")
    flt = df.filter(
        F.col(journey_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(channel_col).isNotNull()
        & F.col(converted_col).isNotNull()
    )
    chk = flt.groupBy(*by, journey_col).agg(
        F.countDistinct(converted_col).alias("_nc"),
        F.count(F.lit(1)).alias("_len"),
    )
    if validation_enabled():
        bad = chk.filter(F.col("_nc") > 1).count()
        if bad:
            raise ValueError(
                f"markov_attribution: {bad} journey(s) with a "
                "non-constant conversion flag — that is a broken join"
            )
    if validation_enabled():
        over = chk.filter(F.col("_len") > max_journey).count()
        if over:
            raise ValueError(
                f"markov_attribution: {over} journey(s) longer than "
                f"max_journey={max_journey}"
            )
    if validation_enabled():
        dup = (
            flt.groupBy(*by, journey_col, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"markov_attribution: {dup} duplicate (journey, order) "
                "key(s) — the chain order would be nondeterministic; "
                "collapse or re-key upstream"
            )
    w = Window.partitionBy(*by, journey_col).orderBy(order_col)
    seq = flt.select(
        *by,
        F.col(journey_col).alias("_j"),
        F.col(channel_col).cast("string").alias("_c"),
        F.col(converted_col).cast("boolean").alias("_conv"),
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*by, journey_col)
        ).alias("_len"),
    )
    w2 = Window.partitionBy(*by, "_j").orderBy("_r")
    nxt = F.lead("_c").over(w2)
    edges = seq.select(
        *by,
        F.when(F.col("_r") == 1, F.lit("__START__"))
        .otherwise(F.lit(None))
        .alias("_pre"),
        "_c",
        "_r",
        "_len",
        "_conv",
        nxt.alias("_nxt"),
    )
    trans = (
        edges.select(
            *by,
            F.lit("__START__").alias("_src"),
            F.col("_c").alias("_dst"),
        ).filter(F.col("_r") == 1)
        .unionByName(
            edges.filter(F.col("_nxt").isNotNull()).select(
                *by,
                F.col("_c").alias("_src"),
                F.col("_nxt").alias("_dst"),
            )
        )
        .unionByName(
            edges.filter(F.col("_nxt").isNull()).select(
                *by,
                F.col("_c").alias("_src"),
                F.when(F.col("_conv"), F.lit("__CONV__"))
                .otherwise(F.lit("__NULL__"))
                .alias("_dst"),
            )
        )
        .groupBy(*by, "_src", "_dst")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    touches = (
        seq.groupBy(*by, F.col("_c").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_touches"))
    )
    n_ch = touches.groupBy(*by).agg(F.count(F.lit(1)).alias("_k"))
    if validation_enabled():
        wide = n_ch.filter(F.col("_k") > max_channels).count()
        if wide:
            raise ValueError(
                f"markov_attribution: a pool exceeds max_channels="
                f"{max_channels}"
            )
    # pack: states = sorted channels + the 3 specials; transitions as
    # (ia, ib, p) with p = n / rowsum(src)
    rowsums = trans.groupBy(*by, "_src").agg(
        F.sum("_n").alias("_rs")
    )
    pt = trans.join(rowsums, [*by, "_src"]).select(
        *by,
        "_src",
        "_dst",
        (F.col("_n").cast("double") / F.col("_rs").cast("double")).alias(
            "_p"
        ),
    )
    states = (
        pt.select(*by, F.col("_src").alias("_s"))
        .unionByName(pt.select(*by, F.col("_dst").alias("_s")))
        .distinct()
        .groupBy(*by)
        .agg(F.sort_array(F.collect_list("_s")).alias("_states"))
    )
    packed = pt.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct("_src", "_dst", "_p"))
        ).alias("_tr")
    )
    joined = (
        packed.join(states, list(by))
        if by
        else packed.crossJoin(states)
    )
    names = F.col("_states")
    tidx = F.transform(
        F.col("_tr"),
        lambda t: F.struct(
            F.array_position(names, t["_src"]).alias("ia"),
            F.array_position(names, t["_dst"]).alias("ib"),
            t["_p"].alias("p"),
        ),
    )
    staged = joined.select(
        *by, F.col("_states").alias("_st"), tidx.alias("_ti")
    )

    conv_i = F.array_position(F.col("_st"), "__CONV__")
    start_i = F.array_position(F.col("_st"), "__START__")

    def absorb(removed_idx):
        """P(absorb at CONV from START) after n_steps, with the
        removed channel's outgoing AND incoming edges nulled."""
        rm = removed_idx if removed_idx is not None else F.lit(-1)
        has_rm = F.lit(removed_idx is not None)
        init = F.transform(
            F.col("_st"),
            lambda s: F.when(s == "__CONV__", F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        )

        def step(v, _i):
            return F.transform(
                F.col("_st"),
                lambda s, idx: F.when(
                    s == "__CONV__", F.lit(1.0)
                )
                .when(
                    (s == "__NULL__") | (has_rm & (idx + 1 == rm)),
                    F.lit(0.0),
                )
                .otherwise(
                    F.aggregate(
                        F.col("_ti"),
                        F.lit(0.0),
                        lambda acc, t: acc
                        + F.when(
                            (t["ia"] == idx + 1)
                            & ~(has_rm & (t["ib"] == rm)),
                            t["p"]
                            * F.element_at(v, t["ib"].cast("int")),
                        ).otherwise(F.lit(0.0)),
                    )
                ),
            )

        final = F.aggregate(
            F.sequence(F.lit(1), F.lit(int(n_steps))), init, step
        )
        return F.element_at(final, start_i.cast("int"))

    base = staged.select(*by, "_st", "_ti", absorb(None).alias("_bp"))
    ex = base.select(
        *by,
        "_bp",
        "_st",
        "_ti",
        F.posexplode("_st").alias("_i0", "channel"),
    ).filter(
        ~F.col("channel").isin("__START__", "__CONV__", "__NULL__")
    )
    rem = ex.select(
        *by,
        "channel",
        "_bp",
        absorb(F.col("_i0") + 1).alias("_rp"),
    )
    eff = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("_rp") / F.col("_bp")
    )
    scored = rem.select(
        *by,
        "channel",
        "_bp",
        "_rp",
        F.when(F.col("_bp") > 0, eff).alias("_eff"),
    )
    w_tot = Window.partitionBy(*by)
    # the share denominator is a float sum over channels — grid each
    # effect onto 1e-9 nano-units so the sum is exact and order-free
    # (the L390 discipline)
    tot = (
        F.sum(
            F.floor(F.col("_eff") * F.lit(1e9) + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .over(w_tot)
        .cast("double")
        / F.lit(1e9)
    )
    out = scored.select(
        *by,
        "channel",
        F.col("_bp").alias("base_p"),
        F.col("_rp").alias("removed_p"),
        F.col("_eff").alias("removal_effect"),
        F.when(tot > 0, F.col("_eff") / tot).alias("share"),
    )
    return out.join(touches, [*by, "channel"]).select(
        *by,
        "channel",
        "n_touches",
        "base_p",
        "removed_p",
        "removal_effect",
        "share",
    )
