"""Evaluation metrics (L164/L165): per-query retrieval metrics
(precision/recall@k, reciprocal rank) and the per-class classification
report (precision/recall/F1) — the scoreboards that close the loop on
the retrieval (L8/L9/L22/L34) and classification (L136/L155) operators
this engine ships.

Exactness: every metric here is a ratio of EXACT integer counts with
ONE IEEE division (F1 uses the single-division identity
2·tp/(n_true + n_pred) instead of composing precision and recall), so
results are bit-identical, ungridded.  Zero denominators → NULL.
Outputs are PER-QUERY / PER-CLASS rows on purpose — a global mean of
ratios would be an order-dependent float sum; callers aggregate with
the repo's fold/decimal discipline if they need a scalar.

Scale shape: keyed equi-joins + combinable groupBys; a 100 TB
prediction table is scanned once per operator.

No reference counterpart; evaluation analytics per SURVEY §2.11.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled


def retrieval_metrics(
    pred: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """``(query_col, n_rel, hits, precision, recall, rr)`` — per-query
    top-k agreement of ``pred`` against ``truth`` (both shaped
    (query, rank, item)).  ``rr`` is 1/rank of the first relevant
    prediction (NULL if none hit)."""
    t = truth.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    )
    n_rel = t.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    p = pred.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_r"),
    )
    hit = p.join(t, ["_q", "_i"]).groupBy("_q").agg(
        F.count(F.lit(1)).alias("hits"), F.min("_r").alias("_first")
    )
    out = n_rel.join(hit, "_q", "left")
    hits = F.coalesce(F.col("hits"), F.lit(0))
    return out.select(
        F.col("_q").alias(query_col),
        "n_rel",
        hits.alias("hits"),
        (hits.cast("double") / F.lit(float(k))).alias("precision"),
        F.when(
            F.col("n_rel") > 0, hits.cast("double") / F.col("n_rel").cast("double")
        ).alias("recall"),
        F.when(
            F.col("_first").isNotNull(),
            F.lit(1.0) / F.col("_first").cast("double"),
        ).alias("rr"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """``(label, n_true, n_pred, tp, precision, recall, f1)`` — one row
    per class appearing as a label OR a prediction (NULLs excluded).
    F1 = 2·tp/(n_true + n_pred): one exact division."""
    flt = df.filter(F.col(label_col).isNotNull() & F.col(pred_col).isNotNull())
    cells = flt.groupBy(
        F.col(label_col).alias("_y"), F.col(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).alias("_o"))
    classes = (
        cells.select(F.col("_y").alias("label"))
        .union(cells.select(F.col("_p").alias("label")))
        .distinct()
    )
    n_true = cells.groupBy(F.col("_y").alias("label")).agg(
        F.sum("_o").alias("n_true")
    )
    n_pred = cells.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_o").alias("n_pred")
    )
    tp = cells.filter(F.col("_y") == F.col("_p")).select(
        F.col("_y").alias("label"), F.col("_o").alias("tp")
    )
    out = (
        classes.join(n_true, "label", "left")
        .join(n_pred, "label", "left")
        .join(tp, "label", "left")
    )
    nt = F.coalesce(F.col("n_true"), F.lit(0))
    np_ = F.coalesce(F.col("n_pred"), F.lit(0))
    tp0 = F.coalesce(F.col("tp"), F.lit(0))
    return out.select(
        "label",
        nt.alias("n_true"),
        np_.alias("n_pred"),
        tp0.alias("tp"),
        F.when(np_ > 0, tp0.cast("double") / np_.cast("double")).alias(
            "precision"
        ),
        F.when(nt > 0, tp0.cast("double") / nt.cast("double")).alias("recall"),
        F.when(
            (nt + np_) > 0,
            (F.lit(2) * tp0).cast("double") / (nt + np_).cast("double"),
        ).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """One row ``(n, po_num, pe_num, kappa)`` — Cohen's κ (L184), the
    chance-corrected agreement between two label columns (two raters,
    model-vs-model, annotation QA):

        κ = (p_o − p_e)/(1 − p_e)
          = (n·Σ_c tp_c − Σ_c n_a,c·n_b,c) / (n² − Σ_c n_a,c·n_b,c)

    — the rescale clears both inner divisions, so every accumulated
    term is an EXACT DECIMAL integer and κ is ONE final IEEE division:
    bit-identical, ungridded.  Perfect agreement → exactly 1.0;
    p_e = 1 (both raters constant) → NULL.  One contingency groupBy +
    two margin aggs — the L165 shape."""
    flt = df.filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    )
    cells = flt.groupBy(
        F.col(rater_a_col).alias("_a"), F.col(rater_b_col).alias("_b")
    ).agg(F.count(F.lit(1)).alias("_o"))
    dec = "decimal(38,0)"
    diag = cells.filter(F.col("_a") == F.col("_b")).agg(
        F.coalesce(F.sum("_o"), F.lit(0)).alias("_tp")
    )
    ma = cells.groupBy("_a").agg(F.sum("_o").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    pe = (
        ma.join(mb, ma["_a"] == mb["_b"])
        .agg(
            F.coalesce(
                F.sum(F.col("_na").cast(dec) * F.col("_nb").cast(dec)),
                F.lit(0).cast(dec),
            ).alias("_pe")
        )
    )
    tot = cells.agg(F.coalesce(F.sum("_o"), F.lit(0)).alias("n"))
    j = tot.crossJoin(diag).crossJoin(pe)
    nd = F.col("n").cast(dec)
    num = nd * F.col("_tp").cast(dec) - F.col("_pe")
    den = nd * nd - F.col("_pe")
    return j.select(
        F.col("n").cast("long").alias("n"),
        num.cast("double").alias("po_num"),
        F.col("_pe").cast("double").alias("pe_num"),
        F.when(
            den != F.lit(0).cast(dec), num.cast("double") / den.cast("double")
        ).alias("kappa"),
    )


def mcnemar(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """``(by..., b, c, chi2, chi2_cc)`` — McNemar's test for PAIRED
    binary outcomes (did classifier x beat classifier y on the same
    rows — the binary companion to Wilcoxon signed-rank, L189).

    b = #(x=1, y=0), c = #(x=0, y=1); concordant pairs carry no
    information and drop out.  χ² = (b−c)²/(b+c), and the Edwards
    continuity-corrected form (|b−c|−1)²/(b+c).  Both are ONE IEEE
    division of exact integers — bit-identical, ungridded.  b+c = 0
    (no discordant pairs) yields NULL for both statistics.

    Scale shape: a single combinable groupBy over the keys — two
    conditional sums, no shuffle beyond the one keyed exchange.
    """
    from .validate import assert_binary

    x = F.col(x_col).cast("int")
    y = F.col(y_col).cast("int")
    flt = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    assert_binary(flt, x_col, "mcnemar")
    assert_binary(flt, y_col, "mcnemar")
    agg = (
        flt.groupBy(*by)
        .agg(
            F.sum(((x == 1) & (y == 0)).cast("long")).alias("b"),
            F.sum(((x == 0) & (y == 1)).cast("long")).alias("c"),
        )
    )
    b, c = F.col("b"), F.col("c")
    d = b - c
    dc = F.abs(d) - F.lit(1)
    return agg.select(
        *by,
        "b",
        "c",
        F.when(
            b + c > 0, (d * d).cast("double") / (b + c).cast("double")
        ).alias("chi2"),
        F.when(
            b + c > 0, (dc * dc).cast("double") / (b + c).cast("double")
        ).alias("chi2_cc"),
    )


def fleiss_kappa(
    df: DataFrame,
    by: list[str],
    subject_col: str,
    category_col: str,
    m: int,
) -> DataFrame:
    """``(by..., n_subjects, kappa)`` — Fleiss' κ, the multi-rater
    generalization of Cohen's κ (L184): each input row is ONE rating
    (subject, category); every subject must carry exactly ``m``
    ratings — subjects with any other count drop (classical Fleiss is
    defined for constant rater count; the drop is loud via
    ``n_subjects``).

    With n_ij = ratings of subject i into category j, T_j = Σ_i n_ij,
    A = Σ_ij n_ij² − n·m, C = Σ_j T_j²:

        P̄  = A / (n·m·(m−1)),   P̄_e = C / (n·m)²,
        κ  = (P̄ − P̄_e)/(1 − P̄_e)
           = (A·n·m − (m−1)·C) / ((m−1)·(n²m² − C))

    — the common factor n·m·(m−1) cleared so κ is ONE IEEE division
    of exact DECIMAL(38,0) integers (worst case n=10¹², m≈10 keeps
    every term under 10²⁸): bit-identical, ungridded.  Denominator 0
    (P̄_e = 1: all kept ratings in one category) yields NULL.

    Scale shape: one combinable (keys, subject, category) groupBy;
    one (keys, subject) agg for the m-filter semi-join (co-partitioned
    on its prefix); one (keys, category) agg; one final combinable
    agg per group.  100 TB scans once; no collect, no crossJoin.
    """
    if m < 1:
        raise ValueError("fleiss_kappa: m must be >= 1")
    dec = "decimal(38,0)"
    cells = (
        df.filter(
            F.col(subject_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .groupBy(
            *by,
            F.col(subject_col).alias("_s"),
            F.col(category_col).alias("_c"),
        )
        .agg(F.count(F.lit(1)).alias("_nij"))
    )
    kept = (
        cells.groupBy(*by, "_s")
        .agg(F.sum("_nij").alias("_tot"))
        .filter(F.col("_tot") == m)
        .select(*by, "_s")
    )
    cells = cells.join(kept, [*by, "_s"], "left_semi")
    nij = F.col("_nij").cast(dec)
    per_cat = cells.groupBy(*by, "_c").agg(
        F.sum("_nij").alias("_tj"),
        F.sum(nij * nij).alias("_sq"),
    )
    tj = F.col("_tj").cast(dec)
    agg = per_cat.groupBy(*by).agg(
        (F.sum("_tj").cast(dec) / F.lit(m).cast(dec))
        .cast("long")
        .alias("n_subjects"),
        F.sum(F.col("_sq")).alias("_sumsq"),
        F.sum(tj * tj).alias("_cc"),
    )
    nd = F.col("n_subjects").cast(dec)
    md = F.lit(m).cast(dec)
    a = F.col("_sumsq") - nd * md
    cterm = F.col("_cc")
    num = a * nd * md - (md - 1) * cterm
    den = (md - 1) * (nd * nd * md * md - cterm)
    return agg.filter(F.col("n_subjects") > 0).select(
        *by,
        "n_subjects",
        F.when(
            den != F.lit(0).cast(dec),
            num.cast("double") / den.cast("double"),
        ).alias("kappa"),
    )


def cochran_q(
    df: DataFrame,
    by: list[str],
    block_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """``(by..., k, n_blocks, q)`` — Cochran's Q: did k binary
    treatments succeed at different rates on the SAME blocks (the
    k-variant generalization of McNemar, L191 — at k = 2 it equals
    McNemar's uncorrected χ² exactly, pinned by test).

    Rows are (block, treatment, outcome∈{0,1}); duplicate cells
    collapse with ``max`` (a success counts once); k = distinct
    treatments per group; incomplete blocks drop (loud via
    ``n_blocks``).  With C_j = per-treatment successes, R_i =
    per-block successes, N = ΣC_j:

        Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)

    — the /k cleared from the classical Σ(C_j − N/k)² form, so both
    sides are exact DECIMAL(38,0) integers (N ≤ 10¹³ at 10¹² blocks
    → N² ≤ 10²⁶) and Q is ONE IEEE division: bit-identical,
    ungridded.  Denominator 0 (every block all-0 or all-1) yields
    NULL q.

    Scale shape: one combinable cell groupBy; (keys, block) and
    (keys, treatment) aggs both co-partitioned on their prefix; one
    final combinable agg.  100 TB scans once.
    """
    dec = "decimal(38,0)"
    flt = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    )
    from .validate import assert_binary

    yv = F.col(outcome_col).cast("int")
    assert_binary(flt, outcome_col, "cochran_q")
    cell = (
        flt.groupBy(
            *by,
            F.col(block_col).alias("_b"),
            F.col(treat_col).alias("_t"),
        )
        .agg(F.max(yv).alias("_y"))
    )
    kdf = cell.groupBy(*by).agg(F.countDistinct("_t").alias("k"))
    per_b = cell.groupBy(*by, "_b").agg(
        F.count(F.lit(1)).alias("_bc"), F.sum("_y").alias("_r")
    )
    joined = cell.join(per_b, [*by, "_b"])
    full = (
        joined.join(F.broadcast(kdf), list(by))
        if by
        else joined.crossJoin(F.broadcast(kdf))
    )
    full = full.filter((F.col("_bc") == F.col("k")) & (F.col("k") >= 2))
    per_t = full.groupBy(*by, "k", "_t").agg(
        F.sum("_y").alias("_c"), F.count(F.lit(1)).alias("_nb")
    )
    cd = F.col("_c").cast(dec)
    aggt = per_t.groupBy(*by, "k").agg(
        F.max("_nb").alias("n_blocks"),
        F.sum(cd * cd).alias("_sumc2"),
        F.sum("_c").alias("_n"),
    )
    # per-block success sums over the SAME kept blocks
    kept_b = full.groupBy(*by, "_b").agg(
        F.max("_r").alias("_rk")
    )
    rd = F.col("_rk").cast(dec)
    aggb = kept_b.groupBy(*by).agg(F.sum(rd * rd).alias("_sumr2"))
    out = (
        aggt.join(aggb, list(by))
        if by
        else aggt.crossJoin(aggb)
    )
    kd = F.col("k").cast(dec)
    nd = F.col("_n").cast(dec)
    num = (kd - 1) * (kd * F.col("_sumc2") - nd * nd)
    den = kd * nd - F.col("_sumr2")
    return out.select(
        *by,
        "k",
        "n_blocks",
        F.when(
            den != F.lit(0).cast(dec),
            num.cast("double") / den.cast("double"),
        ).alias("q"),
    )


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """``(query_col, n_common, rbo, rbo_ext)`` — Rank-Biased Overlap
    (Webber, Moffat & Zobel 2010) between two top-k rankings per
    query: the top-weighted list-similarity that retrieval_metrics
    (L164) can't express — set precision@k ignores ORDER, RBO decays
    each depth by p so agreement near rank 1 dominates.

        rbo     = Σ_{d=1..k} (1−p)·p^{d−1} · X_d / d
        rbo_ext = rbo + p^k · X_k / k

    with X_d = |A_{1..d} ∩ B_{1..d}| (an item joins the overlap at
    depth max(rank_a, rank_b)).  The depth weights (1−p)·p^{d−1} and
    the p^k extrapolation constant are computed ONCE in Python and
    embedded as double literals — both engines then fold the SAME
    constants in the same d order (bounded k), so the score is
    bit-identical with no pow() cross-engine wobble.  Queries missing
    from either side simply have those items non-overlapping; a query
    with no common items scores 0.0 — output rows come from the UNION
    of both sides' query ids (the overlap join is per item, so a
    query present in only one input is also emitted, with
    n_common = 0).

    Scale shape: one equi-join on (query, item); per-query depth
    counts are a bounded k-row expansion; the fold is an ordered
    in-row array aggregate.  100 TB of rankings scan once.
    """
    if not 0 < p < 1 or k < 1:
        raise ValueError("rbo_overlap: need 0 < p < 1 and k >= 1")
    weights = [(1.0 - p) * p ** (d - 1) for d in range(1, k + 1)]
    pk = p**k
    av = a.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_ra"),
    )
    bv = b.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_rb"),
    )
    common = av.join(bv, ["_q", "_i"]).select(
        "_q", F.greatest("_ra", "_rb").alias("_d0")
    )
    queries = (
        av.select("_q").union(bv.select("_q")).distinct()
    )
    per_d0 = common.groupBy("_q", "_d0").agg(
        F.count(F.lit(1)).alias("_m")
    )
    counts = queries.join(per_d0, "_q", "left").groupBy("_q").agg(
        F.coalesce(F.sum("_m"), F.lit(0)).alias("n_common"),
        F.collect_list(F.struct("_d0", "_m")).alias("_entries"),
    )
    # X_d for d = 1..k as an in-row fold over the bounded entry list
    xd = F.transform(
        F.sequence(F.lit(1), F.lit(k)),
        lambda d: F.aggregate(
            F.col("_entries"),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + F.when(e["_d0"] <= d, e["_m"]).otherwise(F.lit(0)),
        ),
    )
    warr = F.array(*[F.lit(w) for w in weights])
    staged = counts.select(
        "_q", "n_common", xd.alias("_xd")
    )
    rbo = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)),
        F.lit(0.0),
        lambda acc, d: acc
        + F.element_at(warr, d.cast("int"))
        * (
            F.element_at(F.col("_xd"), d.cast("int")).cast("double")
            / d.cast("double")
        ),
    )
    ext = rbo + F.lit(pk) * (
        F.element_at(F.col("_xd"), k).cast("double") / F.lit(float(k))
    )
    return staged.select(
        F.col("_q").alias(query_col),
        "n_common",
        rbo.alias("rbo"),
        ext.alias("rbo_ext"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """``(bucket, n, pos, cum_pos, capture, lift, cum_lift)`` — the
    cumulative gains / lift table: rank rows by model score
    descending, cut into ``n_buckets`` equal-count buckets, and ask
    of each "how many of all positives has the top-X% captured, and
    at what multiple of the base rate" — the targeting-economics view
    of a ranking model that ROC-AUC (L146) summarizes away.

    Ordering is (score DESC, id ASC) — the explicit tiebreak makes
    bucket assignment deterministic (ntile over an under-specified
    sort would shuffle ties between buckets per run; the id column is
    the contract).  Bucket b gets rows with ⌈rn·B/n⌉ = b (the exact
    ntile partition, computed as (rn·B + n − 1) DIV n in INTEGER
    arithmetic — no float boundary).  Per bucket, with P total
    positives and N total rows:

        capture  = cum_pos / P          lift     = pos·N / (n_b·P)
        cum_lift = cum_pos·N / (cum_n·P)

    — exact integer counts, one IEEE division per output value:
    bit-identical, ungridded.  P = 0 yields NULL rates.

    Scale shape: global ranks come from the TWO-PHASE distributed
    ranking, not a single-partition window — range-repartition on
    (score DESC, id), per-partition local row_number (parallel keyed
    windows), then partition row-counts (one tiny driver collect,
    bounded by partition count) broadcast back as rank offsets.  The
    result is identical to a global row_number for ANY partition
    boundary choice, and every heavy stage is partition-parallel; the
    final cumulative pass runs on the bounded B-row bucket table."""
    if n_buckets < 1:
        raise ValueError("gains_table: n_buckets must be >= 1")
    flt = df.filter(
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(score_col).alias("_s"),
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("int").alias("_y"),
    )
    parts = flt.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ranged = flt.repartitionByRange(
        int(parts), F.col("_s").desc(), F.col("_id").asc()
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    pc = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    rows = sorted((r["_pid"], r["_pc"]) for r in pc.collect())
    offsets, acc = {}, 0
    for pid, cnt in rows:
        offsets[pid] = acc
        acc += cnt
    total = acc
    off = F.element_at(
        F.create_map(
            *[
                F.lit(v)
                for kv in offsets.items()
                for v in kv
            ]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    w_local = Window.partitionBy("_pid").orderBy(
        F.col("_s").desc(), F.col("_id").asc()
    )
    ranked = ranged.select(
        "_y",
        (F.row_number().over(w_local) + off).alias("_rn"),
        F.lit(total).alias("_n"),
    )
    bucket = F.expr(f"(_rn * {n_buckets} + _n - 1) div _n")
    per = ranked.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("pos"),
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per.select(
        "bucket",
        "n",
        "pos",
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wc).alias("_cum_n"),
        F.sum("pos").over(wt).alias("_p"),
        F.sum("n").over(wt).alias("_nt"),
    )
    pd_ = F.col("_p").cast("double")
    ntd = F.col("_nt").cast("double")
    ok = F.col("_p") > 0
    return staged.select(
        "bucket",
        "n",
        "pos",
        "cum_pos",
        F.when(ok, F.col("cum_pos").cast("double") / pd_).alias("capture"),
        F.when(
            ok,
            (F.col("pos").cast("double") * ntd)
            / (F.col("n").cast("double") * pd_),
        ).alias("lift"),
        F.when(
            ok,
            (F.col("cum_pos").cast("double") * ntd)
            / (F.col("_cum_n").cast("double") * pd_),
        ).alias("cum_lift"),
    )


def ndcg(
    pred: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
    rel_col: str = "rel",
    gain: str = "linear",
) -> DataFrame:
    """``(query_col, n_rel, dcg, idcg, ndcg)`` — normalized discounted
    cumulative gain at ``k`` (L221; Järvelin & Kekäläinen 2002): the
    graded-relevance ranking score that retrieval_metrics (L164,
    binary hits) and rbo_overlap (L200, list-vs-list) can't express.

        DCG@k  = Σ_{d=1..k} gain(rel_d) / log2(d+1)
        IDCG@k = the same sum over the query's grades sorted desc
        NDCG   = DCG / IDCG            (NULL when IDCG = 0)

    ``truth`` is (query, item, rel) with INTEGER grades ≥ 0; ``pred``
    is (query, rank, item).  Predicted items absent from truth gain 0.
    ``gain='linear'`` uses the grade itself; ``'exp'`` uses 2^rel − 1
    (exact BIGINT shift, grades validated ≤ 62).

    Exactness: the discount weights 1/log2(d+1) are computed ONCE in
    Python and embedded as double literals — both engines fold the
    SAME constants in the same bounded d = 1..k order (the L200
    discipline), each term is one exactly-rounded multiply of an exact
    integer gain, and NDCG is ONE division — bit-identical, ungridded.

    Loud refusals: duplicate (query, rank) pairs at depth ≤ k,
    duplicate (query, item) truth pairs, and NULL/negative grades
    raise (they would silently corrupt the pivot / inflate the
    ideal ordering).

    Output rows come from the union of both sides' query ids: a query
    with predictions but no truth rows has idcg/ndcg NULL; a query
    with truth but no predictions scores dcg 0.0.

    Scale shape: one equi-join on (query, item), one bounded-width
    pivot per side, one window top-k on the truth side.  100 TB of
    rankings scan once; no per-query state beyond k cells.
    """
    if k < 1:
        raise ValueError("ndcg: k must be >= 1")
    if gain not in ("linear", "exp"):
        raise ValueError("ndcg: gain must be 'linear' or 'exp'")
    weights = [1.0 / math.log2(d + 1) for d in range(1, k + 1)]
    p = pred.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_r"),
    )
    if validation_enabled():
        n_dup = (
            p.groupBy("_q", "_r")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"ndcg: {n_dup} duplicate (query, rank) pair(s) at depth <= {k}"
            )
    t = truth.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rel_col).cast("long").alias("_g"),
    )
    bad = F.col("_g").isNull() | (F.col("_g") < 0)
    if gain == "exp":
        bad = bad | (F.col("_g") > 62)
    if validation_enabled():
        n_bad = t.filter(bad).count()
        if n_bad:
            raise ValueError(f"ndcg: {n_bad} NULL/negative/oversized grade(s)")
    if validation_enabled():
        n_dup_t = (
            t.groupBy("_q", "_i")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup_t:
            raise ValueError(
                f"ndcg: {n_dup_t} duplicate (query, item) truth pair(s) — "
                "they would inflate n_rel and the ideal ranking"
            )

    def _gain(g):
        if gain == "exp":
            # 2^g − 1 as an exact BIGINT shift (g validated <= 62);
            # F.shiftleft only takes a literal bit count, so F.expr
            return F.expr(
                "shiftleft(cast(1 as bigint), cast(_g as int))"
                " - cast(1 as bigint)"
            )
        return g

    def _fold(prefix: str) -> "F.Column":
        acc = F.lit(0.0)
        for d in range(1, k + 1):
            acc = acc + F.lit(weights[d - 1]) * F.coalesce(
                F.col(f"{prefix}{d}"), F.lit(0).cast("long")
            ).cast("double")
        return acc

    joined = p.join(t, ["_q", "_i"], "left").select(
        "_q", "_r", F.coalesce(_gain(F.col("_g")), F.lit(0).cast("long")).alias("_gv")
    )
    dcg_side = joined.groupBy("_q").agg(
        *[
            F.max(F.when(F.col("_r") == d, F.col("_gv"))).alias(f"_p{d}")
            for d in range(1, k + 1)
        ]
    )
    w_ideal = Window.partitionBy("_q").orderBy(F.col("_g").desc(), F.col("_i"))
    ti = t.withColumn("_rn", F.row_number().over(w_ideal))
    idcg_side = ti.groupBy("_q").agg(
        F.sum(F.when(F.col("_g") > 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_rel"
        ),
        *[
            F.max(
                F.when(F.col("_rn") == d, _gain(F.col("_g")))
            ).alias(f"_t{d}")
            for d in range(1, k + 1)
        ],
    )
    out = dcg_side.join(idcg_side, "_q", "full_outer")
    # a query present only in truth gets dcg = 0.0 (all _p{d} NULL ->
    # per-term coalesce 0); one present only in pred gets idcg NULL
    dcg = _fold("_p")
    idcg = F.when(F.col("n_rel").isNotNull(), _fold("_t"))
    return out.select(
        F.col("_q").alias(query_col),
        "n_rel",
        dcg.alias("dcg"),
        idcg.alias("idcg"),
        F.when(idcg > F.lit(0.0), dcg / idcg).alias("ndcg"),
    )


def average_precision(
    pred: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """``(query_col, n_rel, hits, ap)`` — average precision at ``k``
    (L236): the order-sensitive binary-relevance score that completes
    the retrieval scoreboard (L164 P/R/RR stop at one depth, L221 NDCG
    needs GRADES; AP integrates precision over every hit):

        AP@k = Σ_{d=1..k} hit_d · (H_d / d)  /  min(n_rel, k)

    with H_d the running hit count.  Its corpus mean is MAP — emitted
    per-query on purpose (the L164 aggregate-with-discipline rule).

    Exactness: hits and H_d are exact integers from the bounded rank
    pivot (the L221 shape); each H_d/d is one exactly-rounded
    division, the d-ordered chain is a fixed tree, and the final
    normalization ONE more division — bit-identical, ungridded.
    Duplicate (query, rank) pairs at depth ≤ k are refused loudly.
    Queries with truth but no predictions score 0.0; queries with
    predictions but no truth rows have NULL n_rel/ap.

    Scale shape: L221's — one equi-join on (query, item) + one
    bounded-width pivot; one scan of 100 TB.

    No reference counterpart; evaluation analytics per SURVEY §2.11.
    """
    if k < 1:
        raise ValueError("average_precision: k must be >= 1")
    p = pred.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_r"),
    )
    if validation_enabled():
        n_dup = (
            p.groupBy("_q", "_r")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"average_precision: {n_dup} duplicate (query, rank) "
                f"pair(s) at depth <= {k}"
            )
    t = truth.select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    ).distinct()
    n_rel = t.groupBy("_q").agg(F.count(F.lit(1)).alias("n_rel"))
    joined = p.join(
        t.withColumn("_hit", F.lit(1)), ["_q", "_i"], "left"
    ).select("_q", "_r", F.coalesce(F.col("_hit"), F.lit(0)).alias("_h"))
    pivot = joined.groupBy("_q").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_r") == d, F.col("_h"))), F.lit(0)
            ).alias(f"_h{d}")
            for d in range(1, k + 1)
        ]
    )
    out = n_rel.join(pivot, "_q", "full_outer")
    # running hit counts as an exact integer chain, then the d-ordered
    # precision fold
    cum = None
    ap = F.lit(0.0)
    for d in range(1, k + 1):
        hd = F.coalesce(F.col(f"_h{d}"), F.lit(0))
        cum = hd if cum is None else cum + hd
        ap = ap + F.when(
            hd == 1, cum.cast("double") / F.lit(float(d))
        ).otherwise(F.lit(0.0))
        if d == k:
            hits_expr = cum
    denom = F.least(F.col("n_rel"), F.lit(k))
    return out.select(
        F.col("_q").alias(query_col),
        "n_rel",
        hits_expr.alias("hits"),
        F.when(
            F.col("n_rel").isNotNull() & (denom > 0),
            ap / denom.cast("double"),
        ).alias("ap"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    value_col: str,
) -> DataFrame:
    """One row ``(n_units, m, n, n_categories, d_o_num, d_e_num,
    alpha)`` — Krippendorff's α for NOMINAL data over a BALANCED
    design (L238): the inter-rater agreement that generalizes κ
    (L184, two raters) and Fleiss' κ (L192, fixed panel) with a
    disagreement-based derivation.  Each row is one rating of a unit;
    every unit must carry the SAME number m ≥ 2 of ratings (validated
    loudly — the balanced restriction is what keeps α an exact
    integer identity; unbalanced designs divide by per-unit (m_u−1)
    and would need float unit sums).

    With per-unit category counts n_uc, margins n_c, N = U·m:

        D_o ∝ Σ_u (m² − Σ_c n_uc²)          (pairs disagreeing in-unit)
        D_e ∝ N² − Σ_c n_c²                  (pairs disagreeing pooled)
        α = 1 − ((N−1)·D_o_num) / ((m−1)·D_e_num)

    All sums are exact DECIMAL integers (combinable aggs, no folds);
    α is ONE division — bit-identical, ungridded.  D_e = 0 (every
    rating the same category) → NULL α; perfect in-unit agreement →
    exactly 1.0.

    Scale shape: one (unit, value) groupBy + bounded margin aggs —
    100 TB of annotations scans once.

    No reference counterpart; annotation-QA analytics per SURVEY
    §2.11.
    """
    dec = "decimal(38,0)"
    flt = df.filter(
        F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
    )
    uc = flt.groupBy(
        F.col(unit_col).alias("_u"), F.col(value_col).alias("_c")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_unit = uc.groupBy("_u").agg(
        F.sum("_n").alias("_m"),
        F.sum(F.col("_n").cast(dec) * F.col("_n").cast(dec)).alias("_sq"),
    )
    mm = per_unit.agg(
        F.min("_m").alias("_mlo"), F.max("_m").alias("_mhi")
    ).collect()[0]
    if mm["_mlo"] is None:
        raise ValueError("krippendorff_alpha: no ratings after NULL filter")
    if mm["_mlo"] != mm["_mhi"]:
        raise ValueError(
            "krippendorff_alpha: unbalanced design — units carry "
            f"between {mm['_mlo']} and {mm['_mhi']} ratings; the exact "
            "integer identity needs a constant m (filter or impute "
            "to a balanced panel first)"
        )
    if mm["_mlo"] < 2:
        raise ValueError(
            "krippendorff_alpha: m must be >= 2 (a single rating per "
            "unit carries no pairable information)"
        )
    md = F.col("_m").cast(dec)
    units = per_unit.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.max("_m").alias("m"),
        F.sum(md * md - F.col("_sq")).alias("_do"),
    )
    margins = uc.groupBy("_c").agg(F.sum("_n").alias("_nc"))
    ncd = F.col("_nc").cast(dec)
    exp = margins.agg(
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(ncd).alias("_nt"),
        F.sum(ncd * ncd).alias("_ncsq"),
    )
    j = units.crossJoin(F.broadcast(exp))
    n_total = F.col("_nt")
    de = n_total * n_total - F.col("_ncsq")
    num = (n_total - 1) * F.col("_do")
    den = (F.col("m").cast(dec) - 1) * de
    return j.select(
        "n_units",
        "m",
        F.col("_nt").cast("long").alias("n"),
        "n_categories",
        F.col("_do").cast("double").alias("d_o_num"),
        de.cast("double").alias("d_e_num"),
        F.when(
            de != F.lit(0).cast(dec),
            F.lit(1.0) - num.cast("double") / den.cast("double"),
        ).alias("alpha"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, k, sum_item_var, total_var, alpha)`` — Cronbach's
    α (L240): the internal-consistency reliability of a k-item scale
    (do the item columns measure one underlying thing) — the
    survey/rubric-QA companion to the rater-agreement family
    (L184/L192/L238 compare RATERS; α audits the INSTRUMENT):

        α = k/(k−1) · (1 − Σⱼ σ²ⱼ / σ²_total)

    with sample variances from EXACT DECIMAL sufficient statistics
    (the L139 tree): per-item (Sⱼ, Sxxⱼ) and the per-row total
    t = Σⱼ xⱼ (an exact decimal sum of a BOUNDED column list, folded
    in the given item order — identical chain both engines).  Σⱼσ²ⱼ
    folds over the literal item order.  Rows with ANY NULL item are
    dropped listwise (documented; a partial row would corrupt the
    total-score variance).  n < 2 or σ²_total = 0 → NULL α.

    Scale shape: ONE combinable aggregation over one scan — 2k+2
    decimal sums, no shuffle beyond the final reduce.

    No reference counterpart; annotation-QA analytics per SURVEY
    §2.11.
    """
    if len(item_cols) < 2:
        raise ValueError("cronbach_alpha: need at least 2 item columns")
    dec = f"decimal(18,{scale})"
    wide = f"decimal(38,{scale})"
    cond = F.col(item_cols[0]).isNotNull()
    for c in item_cols[1:]:
        cond = cond & F.col(c).isNotNull()
    flt = df.filter(cond)
    items = [F.col(c).cast(dec) for c in item_cols]
    total = items[0].cast(wide)
    for it in items[1:]:
        total = total + it
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, it in enumerate(items):
        aggs.append(F.sum(it).alias(f"_s{i}"))
        aggs.append(F.sum(it * it).alias(f"_q{i}"))
    aggs.append(F.sum(total).alias("_st"))
    aggs.append(F.sum(total * total).alias("_qt"))
    agg = flt.agg(*aggs)
    nd = F.col("n").cast("double")

    def _var(s, q):
        sd_ = s.cast("double")
        qd = q.cast("double")
        return (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))

    sum_var = _var(F.col("_s0"), F.col("_q0"))
    for i in range(1, len(item_cols)):
        sum_var = sum_var + _var(F.col(f"_s{i}"), F.col(f"_q{i}"))
    tot_var = _var(F.col("_st"), F.col("_qt"))
    k = len(item_cols)
    alpha = (F.lit(float(k)) / F.lit(float(k - 1))) * (
        F.lit(1.0) - sum_var / tot_var
    )
    ok = (F.col("n") >= 2) & (tot_var > 0.0)
    return agg.select(
        "n",
        F.lit(k).alias("k"),
        F.when(F.col("n") >= 2, sum_var).alias("sum_item_var"),
        F.when(F.col("n") >= 2, tot_var).alias("total_var"),
        F.when(ok, alpha).alias("alpha"),
    )


def topk_churn(
    df: DataFrame,
    period_col: str,
    item_col: str,
    score_col: str,
    k: int = 10,
) -> DataFrame:
    """``(period, prev_period, n_common, jaccard, entered, exited)`` —
    top-k list churn between CONSECUTIVE periods (L249): how fast the
    leaderboard turns over — the trending-monitor companion to RBO
    (L200 compares two rankings positionally; churn tracks set
    turnover through time).

    Per period, the top-k items by (score DESC, item ASC — the T1
    deterministic tiebreak); consecutive periods pair by the DENSE
    rank of the period value (gaps in the period domain pair with the
    previous OBSERVED period, documented).  Overlap counts are exact
    integers; jaccard = common/(2k − common) is ONE division (both
    top-k sets have exactly k members when the period has ≥ k items —
    thinner periods use their actual size).  The first period has no
    predecessor and is omitted.

    Scale shape: one keyed window top-k (TakeOrdered per period) +
    one self-join on adjacent period ranks — bounded k·periods rows
    after the window.  100 TB of fact rows scans once.

    No reference counterpart; trend-monitoring analytics per SURVEY
    §2.11.
    """
    if k < 1:
        raise ValueError("topk_churn: k must be >= 1")
    flt = df.filter(
        F.col(period_col).isNotNull()
        & F.col(item_col).isNotNull()
        & F.col(score_col).isNotNull()
    )
    w = Window.partitionBy(period_col).orderBy(
        F.col(score_col).desc(), F.col(item_col)
    )
    top = (
        flt.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col(period_col).alias("_p"), F.col(item_col).alias("_i")
        )
    )
    periods = top.select("_p").distinct()
    wp = Window.orderBy("_p")
    periods = periods.withColumn("_ord", F.dense_rank().over(wp))
    tp = top.join(periods, "_p")
    cur = tp.select(
        F.col("_p").alias("period"), F.col("_ord").alias("_o"), "_i"
    )
    prv = tp.select(
        F.col("_p").alias("prev_period"),
        (F.col("_ord") + 1).alias("_o"),
        F.col("_i").alias("_j"),
    )
    sizes_cur = cur.groupBy("period", "_o").agg(
        F.count(F.lit(1)).alias("_nc")
    )
    sizes_prv = prv.groupBy("prev_period", "_o").agg(
        F.count(F.lit(1)).alias("_np")
    )
    common = (
        cur.join(prv, (cur["_o"] == prv["_o"]) & (cur["_i"] == prv["_j"]))
        .groupBy("period", "prev_period", cur["_o"].alias("_o"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pairs = (
        sizes_cur.join(sizes_prv, "_o")
        .join(common, ["period", "prev_period", "_o"], "left")
        .select(
            "period",
            "prev_period",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            "_nc",
            "_np",
        )
    )
    nc = F.col("n_common")
    union = F.col("_nc") + F.col("_np") - nc
    return pairs.select(
        "period",
        "prev_period",
        "n_common",
        F.when(
            union > 0, nc.cast("double") / union.cast("double")
        ).alias("jaccard"),
        (F.col("_nc") - nc).alias("entered"),
        (F.col("_np") - nc).alias("exited"),
    )


def bowker_symmetry(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """``(by..., k, n, chi2, dof)`` — Bowker's test of symmetry
    (L251): the k-class generalization of McNemar (L171's binary
    before/after question asked of a MULTI-class labeler pair — did
    relabeling/model-swap shift classes systematically, or are the
    off-diagonal flows balanced):

        χ² = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji)

    over the paired contingency table (diagonal cells carry no
    information and drop out, exactly like McNemar's concordant
    pairs).  Cell counts are exact integers; each pair term is ONE
    division folded over the BOUNDED sorted (i, j) pair list; pairs
    with n_ij + n_ji = 0 are skipped and dof counts the non-degenerate
    pairs (the standard convention — a structurally-empty pair carries
    no constraint).  dof = 0 → NULL chi2.  At k = 2 the statistic
    equals McNemar's uncorrected χ² (pinned by test).

    Scale shape: one combinable (keys, x, y) groupBy + a bounded
    self-pairing of the k² cell table.  100 TB scans once.

    No reference counterpart; annotation-QA analytics per SURVEY
    §2.11.
    """
    flt = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    cells = flt.groupBy(
        *by, F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("_o"))
    a = cells.select(
        *by,
        F.col("_x").alias("_i"),
        F.col("_y").alias("_j"),
        F.col("_o").alias("_nij"),
    ).filter(F.col("_i") < F.col("_j"))
    b = cells.select(
        *by,
        F.col("_y").alias("_i"),
        F.col("_x").alias("_j"),
        F.col("_o").alias("_nji"),
    ).filter(F.col("_i") < F.col("_j"))
    pairs = a.join(b, [*by, "_i", "_j"], "full_outer").select(
        *by,
        "_i",
        "_j",
        F.coalesce(F.col("_nij"), F.lit(0)).alias("_nij"),
        F.coalesce(F.col("_nji"), F.lit(0)).alias("_nji"),
    )
    tot = cells.groupBy(*by).agg(F.sum("_o").alias("n"))
    ks = (
        cells.select(*by, F.col("_x").alias("_c"))
        .union(cells.select(*by, F.col("_y").alias("_c")))
        .groupBy(*by)
        .agg(F.count_distinct("_c").alias("k"))
    )
    agg = pairs.groupBy(*by).agg(
        F.sum(
            F.when(F.col("_nij") + F.col("_nji") > 0, 1).otherwise(0)
        ).alias("dof"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("_i", "_j", "_nij", "_nji"))
            ),
            F.lit(0.0),
            lambda acc, v: acc
            + F.when(
                v["_nij"] + v["_nji"] > 0,
                ((v["_nij"] - v["_nji"]).cast("double")
                 * (v["_nij"] - v["_nji"]).cast("double"))
                / (v["_nij"] + v["_nji"]).cast("double"),
            ).otherwise(F.lit(0.0)),
        ).alias("_chi2"),
    )
    out = ks.join(tot.select(*by, "n"), by) if by else ks.crossJoin(
        tot.select("n")
    )
    out = out.join(agg, by, "left") if by else out.crossJoin(agg)
    return out.select(
        *by,
        "k",
        "n",
        F.when(F.col("dof") > 0, F.col("_chi2")).alias("chi2"),
        F.coalesce(F.col("dof"), F.lit(0).cast("long")).alias("dof"),
    )


def stuart_maxwell_3(
    df: DataFrame,
    by: list[str],
    before_col: str,
    after_col: str,
) -> DataFrame:
    """``(by..., n, d1, d2, d3, chi2, dof)`` — the Stuart-Maxwell
    marginal-homogeneity test for a 3×3 paired table (L277): did the
    CLASS DISTRIBUTION shift between two paired labelings — the
    k-class McNemar for margins, completing the paired-table family
    (McNemar L186 = 2×2, Bowker L251 = cell symmetry; Stuart-Maxwell
    asks the weaker marginal question Bowker's symmetry implies):

        dᵢ = nᵢ₊ − n₊ᵢ,   χ² = (m̄₂₃·d₁² + m̄₁₃·d₂² + m̄₁₂·d₃²)
                               / (m̄₁₂·m̄₁₃ + m̄₁₂·m̄₂₃ + m̄₁₃·m̄₂₃)

    with m̄ᵢⱼ = nᵢⱼ + nⱼᵢ (the DOUBLED off-diagonal means, so the
    classic ½/2 factors cancel and every quantity is an EXACT
    integer; dof = 2).  The closed form exists only at k = 3 (general
    k needs a (k−1)×(k−1) inverse); other category counts are REFUSED
    loudly.  Categories are ordered lexicographically; a zero
    denominator (perfect agreement off-diagonal) → NULL chi2.

    Scale shape: one combinable (keys, before, after) cell count —
    one scan of 100 TB; everything after is per-group constant math.

    No reference counterpart; paired-label analytics per SURVEY §2.11.
    """
    flt = df.filter(
        F.col(before_col).isNotNull() & F.col(after_col).isNotNull()
    )
    cats = sorted(
        r[0]
        for r in flt.select(F.col(before_col).alias("c"))
        .union(flt.select(F.col(after_col).alias("c")))
        .distinct()
        .collect()
    )
    if len(cats) != 3:
        raise ValueError(
            f"stuart_maxwell_3: need exactly 3 categories, got {cats}"
        )
    c1, c2, c3 = cats

    def _cell(i, j):
        return F.sum(
            F.when(
                (F.col(before_col) == i) & (F.col(after_col) == j), 1
            ).otherwise(0)
        )

    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            _cell(i, j).alias(f"_n{a}{b}")
            for a, i in enumerate(cats, 1)
            for b, j in enumerate(cats, 1)
        ],
    )
    row = lambda a: sum(
        (F.col(f"_n{a}{b}") for b in (1, 2, 3)), F.lit(0)
    )
    col = lambda b: sum(
        (F.col(f"_n{a}{b}") for a in (1, 2, 3)), F.lit(0)
    )
    d1, d2, d3 = (row(i) - col(i) for i in (1, 2, 3))
    m12 = F.col("_n12") + F.col("_n21")
    m13 = F.col("_n13") + F.col("_n31")
    m23 = F.col("_n23") + F.col("_n32")
    num = (
        m23.cast("double") * d1.cast("double") * d1.cast("double")
        + m13.cast("double") * d2.cast("double") * d2.cast("double")
        + m12.cast("double") * d3.cast("double") * d3.cast("double")
    )
    den = (
        m12.cast("double") * m13.cast("double")
        + m12.cast("double") * m23.cast("double")
        + m13.cast("double") * m23.cast("double")
    )
    return agg.select(
        *by,
        "n",
        d1.alias("d1"),
        d2.alias("d2"),
        d3.alias("d3"),
        F.when(den > 0.0, num / den).alias("chi2"),
        F.when(den > 0.0, F.lit(2)).alias("dof"),
    )


def lins_ccc(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, pearson, c_b, ccc)`` — Lin's concordance
    correlation coefficient (L315, Lin 1989): do two CONTINUOUS
    measurements AGREE (fall on the y = x line), not merely correlate
    — the continuous-score counterpart of Cohen's κ (L185) and the
    fix for the classic trap where a re-scored model correlates 0.99
    with the old one while sitting 20 points higher:

        CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²)  =  r · C_b

    (C_b = the bias-correction factor; CCC = Pearson times how far
    the best-fit line sits from the identity).  All five sufficient
    sums are EXACT decimals (the L139 discipline); CCC is one fixed
    IEEE tree.  Population (1/n) moments, the standard CCC
    convention.  Zero variance on both margins and equal means →
    NULL (0/0); n < 2 → NULL.

    Scale shape: ONE combinable aggregation — one scan of 100 TB.

    No reference counterpart; agreement analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_col).cast(dec)
    agg = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("_sx"),
            F.sum(yd).alias("_sy"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(yd * yd).alias("_syy"),
            F.sum(xd * yd).alias("_sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    # population moments via the cross-multiplied exact sums
    vx = (nd * sxx - sx * sx) / (nd * nd)
    vy = (nd * syy - sy * sy) / (nd * nd)
    cov = (nd * sxy - sx * sy) / (nd * nd)
    dm = sx / nd - sy / nd
    den = vx + vy + dm * dm
    ccc = F.lit(2.0) * cov / den
    r = cov / F.sqrt(vx * vy)
    ok = (F.col("n") >= 2) & (den > 0.0)
    ok_r = ok & (vx > 0.0) & (vy > 0.0)
    return agg.select(
        *by,
        "n",
        F.when(ok_r, r).alias("pearson"),
        F.when(ok_r & (cov != 0.0), ccc / r).alias("c_b"),
        F.when(ok, ccc).alias("ccc"),
    )


def bland_altman(
    df: DataFrame,
    by: list[str],
    x_col: str,
    y_col: str,
    z: float = 1.96,
    scale: int = 4,
) -> DataFrame:
    """``(by..., n, bias, sd_diff, loa_lo, loa_hi, coverage)`` — the
    Bland-Altman limits of agreement (L316, Bland & Altman 1986):
    HOW FAR APART can two measurements of the same thing be — the
    method-comparison companion to Lin's CCC (L315 scores agreement;
    Bland-Altman quantifies its width in the measurement's own
    units):

        d = x − y;  bias = d̄;  LoA = bias ± z·s_d
        coverage = share of |d − bias| ≤ z·s_d

    The difference sums are exact decimals (d is exact, so d̄ and s_d
    come from cross-multiplied sums — sample s_d, the standard BA
    convention); coverage needs a SECOND scan with the fitted limits
    broadcast back (fit-small/apply-wide, the L143 discipline) but
    its count is exact.  n < 2 or zero s_d → NULL limits (coverage 1
    by definition when every d equals the bias — reported NULL with
    the limits, never silently).

    Scale shape: one combinable agg + one broadcast join back + one
    combinable count — two scans.

    No reference counterpart; agreement analytics per SURVEY §2.11.
    """
    dec = f"decimal(18,{scale})"
    flt = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    # re-cast the difference to (18,s) so d*d multiplies at (37,2s)
    # EXACTLY — a wider operand makes Spark cap the product scale and
    # round (ANSI fails loudly if a difference ever overflows 18,s)
    d = (F.col(x_col).cast(dec) - F.col(y_col).cast(dec)).cast(dec)
    base = flt.select(*by, d.alias("_d"))
    agg = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_d").alias("_s"),
        F.sum(F.col("_d") * F.col("_d")).alias("_q"),
    )
    nd = F.col("n").cast("double")
    sd_ = F.col("_s").cast("double")
    qd = F.col("_q").cast("double")
    bias = sd_ / nd
    var = (nd * qd - sd_ * sd_) / (nd * (nd - F.lit(1.0)))
    sdd = F.sqrt(var)
    zl = F.lit(float(z))
    ok = (F.col("n") >= 2) & (var > 0.0)
    fit = agg.select(
        *by,
        "n",
        bias.alias("bias"),
        F.when(ok, sdd).alias("sd_diff"),
        F.when(ok, bias - zl * sdd).alias("loa_lo"),
        F.when(ok, bias + zl * sdd).alias("loa_hi"),
    )
    joined = (
        base.join(F.broadcast(fit), by)
        if by
        else base.crossJoin(F.broadcast(fit))
    )
    inside = (
        F.col("_d").cast("double") >= F.col("loa_lo")
    ) & (F.col("_d").cast("double") <= F.col("loa_hi"))
    cov = joined.groupBy(
        *by, "n", "bias", "sd_diff", "loa_lo", "loa_hi"
    ).agg(F.sum(inside.cast("long")).alias("_in"))
    return cov.select(
        *by,
        "n",
        "bias",
        "sd_diff",
        "loa_lo",
        "loa_hi",
        F.when(
            F.col("sd_diff").isNotNull(),
            F.col("_in").cast("double") / F.col("n").cast("double"),
        ).alias("coverage"),
    )


def gwet_ac1(
    df: DataFrame,
    by: list[str],
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """``(by..., n, p_a, p_e, ac1)`` — Gwet's AC1 agreement
    coefficient (L334, Gwet 2008): chance-corrected two-rater
    agreement that does NOT collapse under prevalence skew the way
    Cohen's κ (L185) does (the "high agreement, κ ≈ 0" paradox when
    one label dominates — exactly the regime of labeling-pipeline
    QC):

        p_a = observed agreement
        p_e = Σ_q π_q·(1 − π_q)/(Q − 1),  π_q = mean marginal share
        AC1 = (p_a − p_e)/(1 − p_e)

    Agreement and marginal counts are exact integers; p_e folds over
    the bounded sorted category list (the L140 discipline); AC1 is
    one fixed tree.  Q < 2 or p_e = 1 → NULL.

    Scale shape: one combinable agg for p_a + one (keys, category)
    cell agg + one bounded fold.

    No reference counterpart; annotation-QC analytics per SURVEY
    §2.11.
    """
    flt = df.filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    )
    base = flt.select(
        *by,
        F.col(rater_a_col).alias("_ra"),
        F.col(rater_b_col).alias("_rb"),
    )
    pa_agg = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("_ra") == F.col("_rb")).cast("long")
        ).alias("_agree"),
    )
    cats = (
        base.select(*by, F.col("_ra").alias("_c"))
        .unionAll(base.select(*by, F.col("_rb").alias("_c")))
        .groupBy(*by, "_c")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    packed = cats.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_q"),
        F.sort_array(F.collect_list(F.struct("_c", "_m"))).alias(
            "_lv"
        ),
    )
    j = (
        pa_agg.join(packed, by)
        if by
        else pa_agg.crossJoin(packed)
    )
    nd = F.col("n").cast("double")
    # pi_q = (count over both raters)/(2n); p_e folds the bounded list
    pe = F.aggregate(
        F.col("_lv"),
        F.lit(0.0),
        lambda a, e: a
        + (e["_m"].cast("double") / (F.lit(2.0) * nd))
        * (
            F.lit(1.0)
            - e["_m"].cast("double") / (F.lit(2.0) * nd)
        ),
    ) / (F.col("_q").cast("double") - F.lit(1.0))
    pa = F.col("_agree").cast("double") / nd
    ac1 = (pa - pe) / (F.lit(1.0) - pe)
    ok = (F.col("_q") >= 2) & (F.col("n") >= 1)
    return j.select(
        *by,
        "n",
        pa.alias("p_a"),
        F.when(ok, pe).alias("p_e"),
        F.when(ok & (pe != 1.0), ac1).alias("ac1"),
    )


def expected_reciprocal_rank(
    df: DataFrame,
    by: list[str],
    order_cols: list[str],
    grade_col: str,
    g_max: int = 4,
    max_rank: int | None = None,
) -> DataFrame:
    """``(by..., n, err)`` — Expected Reciprocal Rank (L372; Chapelle
    2009): the CASCADE-model ranking metric — the user scans down the
    list and stops at the first satisfying result — which is the
    behavioral story NDCG's independent-position discounts (L221)
    cannot tell: a perfect result at rank 1 makes everything below it
    nearly worthless in ERR, while NDCG still credits it.

        R_g = (2^g − 1)/2^g_max          (satisfaction probability)
        ERR = Σ_r (1/r)·R_r·Π_{i<r}(1 − R_i)

    The satisfaction table is computed ONCE in Python and embedded as
    double literals (exact dyadic rationals — the L221 discipline);
    the running stop-probability and the ERR sum ride ONE ordered
    struct fold over the per-key ranking, truncated to ``max_rank``
    AFTER the deterministic sort.  Duplicate order keys are refused
    (fold order would be nondeterministic), as are NULL grades or
    grades outside [0, g_max].

    Scale shape: one groupBy packing each ranking + a bounded in-row
    fold — rankings parallelize across the cluster.

    No reference counterpart; retrieval evaluation per SURVEY §2.11.
    """
    if not 1 <= g_max <= 30:
        raise ValueError("expected_reciprocal_rank: g_max must be in [1, 30]")
    if max_rank is not None and max_rank < 1:
        raise ValueError("expected_reciprocal_rank: max_rank must be >= 1")
    rs = [float(2**g - 1) / float(2**g_max) for g in range(g_max + 1)]
    oms = [1.0 - r for r in rs]

    null_pred = F.col(grade_col).isNull()
    for c in order_cols:
        null_pred = null_pred | F.col(c).isNull()
    if validation_enabled():
        n_null = df.filter(null_pred).count()
        if n_null:
            raise ValueError(
                f"expected_reciprocal_rank: {n_null} NULL value(s)"
            )
    if validation_enabled():
        n_bad = df.filter(
            (F.col(grade_col).cast("long") < 0)
            | (F.col(grade_col).cast("long") > g_max)
        ).count()
        if n_bad:
            raise ValueError(
                f"expected_reciprocal_rank: {n_bad} grade(s) outside "
                f"[0, {g_max}]"
            )
    if validation_enabled():
        n_dup = (
            df.groupBy(*by, *order_cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"expected_reciprocal_rank: {n_dup} duplicate order "
                "key(s) — the ranking would be nondeterministic"
            )

    packed = df.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    *[F.col(c) for c in order_cols],
                    F.col(grade_col).cast("int").alias("_g"),
                )
            )
        ).alias("_items")
    )
    items = (
        F.slice(F.col("_items"), 1, max_rank)
        if max_rank is not None
        else F.col("_items")
    )
    r_tab = F.array(*[F.lit(v) for v in rs])
    om_tab = F.array(*[F.lit(v) for v in oms])
    init = F.struct(
        F.lit(1.0).alias("p"),
        F.lit(0.0).alias("err"),
        F.lit(0).cast("long").alias("r"),
    )

    def _step(acc, it):
        rr = F.element_at(r_tab, it["_g"] + 1)
        om = F.element_at(om_tab, it["_g"] + 1)
        rd = (acc["r"] + F.lit(1).cast("long")).cast("double")
        return F.struct(
            (acc["p"] * om).alias("p"),
            (acc["err"] + acc["p"] * rr / rd).alias("err"),
            (acc["r"] + F.lit(1).cast("long")).alias("r"),
        )

    folded = packed.select(
        *by,
        F.size(items).alias("n"),
        F.aggregate(items, init, _step).alias("_acc"),
    )
    return folded.select(
        *by, "n", F.col("_acc")["err"].alias("err")
    )


def binary_confusion_panel(
    df: DataFrame,
    by: list[str],
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Binary confusion panel (L376): ``(by..., n, tp, fp, fn, tn,
    accuracy, tpr, tnr, ppv, npv, balanced_accuracy, mcc,
    fowlkes_mallows, informedness, markedness)`` — the single-number
    scoreboard for a hard 0/1 classifier that the per-class L165
    report and threshold-free L146 AUC don't give: MCC (the
    prevalence-robust ±1 correlation of predictions with truth),
    balanced accuracy (mean of the two recalls — honest on skewed
    classes where plain accuracy lies), Fowlkes-Mallows √(PPV·TPR),
    and the Youden/markedness decompositions MCC² = inf·mark.

    Exactness: the four cells are exact longs from ONE combinable
    conditional-count aggregation; the MCC numerator tp·tn − fp·fn is
    exact DECIMAL (19,0)-operand products per the 8fe91f8 width
    discipline; the denominator marginals are exact longs whose
    double products flow through one fixed IEEE tree
    √((tp+fp)·(tp+fn) · ((tn+fp)·(tn+fn))) — bit-identical on any
    engine and partitioning.  Non-binary labels/predictions are
    REFUSED loudly (a silent cast would score garbage); NULL rows on
    either side are excluded.  NULL semantics: mcc/fowlkes/etc are
    NULL (not 0) when a marginal is empty — an all-positive predictor
    has no defined correlation with truth.

    Scale shape: one map-side-combinable groupBy over four
    conditional counts; 100 TB scanned once, no wide rows, no second
    exchange."""
    flt = df.filter(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        *by,
        F.col(label_col).cast("int").alias("_y"),
        F.col(pred_col).cast("int").alias("_c"),
    )
    if validation_enabled():
        n_bad = flt.filter(
            ~F.col("_y").isin([0, 1]) | ~F.col("_c").isin([0, 1])
        ).count()
        if n_bad:
            raise ValueError(
                f"binary_confusion_panel: {n_bad} row(s) with non-binary "
                "label or prediction — encode to 0/1 first"
            )
    cell = lambda y, c: F.sum(  # noqa: E731
        ((F.col("_y") == y) & (F.col("_c") == c)).cast("long")
    )
    agg = flt.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        cell(1, 1).alias("tp"),
        cell(0, 1).alias("fp"),
        cell(1, 0).alias("fn"),
        cell(0, 0).alias("tn"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    tpd, fpd = tp.cast("double"), fp.cast("double")
    fnd, tnd = fn.cast("double"), tn.cast("double")
    nd = F.col("n").cast("double")
    pos, neg = tp + fn, tn + fp
    ppos, pneg = tp + fp, tn + fn
    tpr = F.when(pos > 0, tpd / pos.cast("double"))
    tnr = F.when(neg > 0, tnd / neg.cast("double"))
    ppv = F.when(ppos > 0, tpd / ppos.cast("double"))
    npv = F.when(pneg > 0, tnd / pneg.cast("double"))
    d19 = "decimal(19,0)"
    mcc_num = (
        tp.cast(d19) * tn.cast(d19) - fp.cast(d19) * fn.cast(d19)
    ).cast("double")
    mcc_den = F.sqrt(
        (ppos.cast("double") * pos.cast("double"))
        * (neg.cast("double") * pneg.cast("double"))
    )
    all_m = (pos > 0) & (neg > 0) & (ppos > 0) & (pneg > 0)
    return agg.select(
        *by,
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        ((tpd + tnd) / nd).alias("accuracy"),
        tpr.alias("tpr"),
        tnr.alias("tnr"),
        ppv.alias("ppv"),
        npv.alias("npv"),
        F.when(
            (pos > 0) & (neg > 0),
            (tpd / pos.cast("double") + tnd / neg.cast("double"))
            / F.lit(2.0),
        ).alias("balanced_accuracy"),
        F.when(all_m, mcc_num / mcc_den).alias("mcc"),
        F.when(
            (ppos > 0) & (pos > 0),
            F.sqrt(
                (tpd / ppos.cast("double")) * (tpd / pos.cast("double"))
            ),
        ).alias("fowlkes_mallows"),
        F.when(
            (pos > 0) & (neg > 0),
            tpd / pos.cast("double") + tnd / neg.cast("double") - F.lit(1.0),
        ).alias("informedness"),
        F.when(
            (ppos > 0) & (pneg > 0),
            tpd / ppos.cast("double")
            + tnd / pneg.cast("double")
            - F.lit(1.0),
        ).alias("markedness"),
    )


def off_policy_eval(
    df: DataFrame,
    by: list[str],
    prob_col: str,
    match_col: str,
    reward_col: str,
    clip: float = 10.0,
    min_prob: float = 1e-4,
    max_abs_reward: float = 1e4,
) -> DataFrame:
    """Off-policy evaluation panel (L413): ``(by..., n, n_match,
    mean_logged_reward, ips, ips_clipped, snips, ess)`` — what WOULD
    the new policy have earned on the logged traffic (Horvitz-
    Thompson importance weighting over bandit logs — the
    counterfactual scoreboard for ranking/prompt/policy changes
    evaluated without an A/B):

        w        = match ? 1/p : 0      (p = logging propensity,
                                         match = target picks the
                                         same action)
        IPS      = (1/n)·Σ w·r
        IPS_clip = (1/n)·Σ min(w, clip)·r
        SNIPS    = Σ w·r / Σ w          (self-normalized; NULL when
                                         the policies never agree)
        ESS      = (Σw)²/Σw²            (how many effective samples
                                         the estimate really has)

    Per-row terms are IEEE products, so each (w·r, w, w², clipped
    forms) is quantized half-up onto the 1e-9 grid and summed as
    EXACT decimals (the L390 discipline — a float sum over 10¹²
    logged events is order-dependent; the grid IS the contract).
    The grid bounds the domain loudly: propensities below
    ``min_prob`` are REFUSED (the positivity floor every serious
    OPE pipeline enforces anyway — a 10⁻⁶ propensity makes the
    estimator useless variance) as are |rewards| above
    ``max_abs_reward`` and p outside (0, 1].

    Scale shape: one narrow projection + ONE combinable groupBy.

    No reference counterpart; policy-eval analytics per SURVEY §2.11
    (Horvitz-Thompson L323 is the survey twin; this is the bandit
    form with clipping/self-normalization/ESS)."""
    if clip <= 0:
        raise ValueError("off_policy_eval: clip must be > 0")
    if validation_enabled():
        bad = df.filter(
            F.col(prob_col).isNull()
            | (F.col(prob_col) < min_prob)
            | (F.col(prob_col) > 1.0)
            | F.col(match_col).isNull()
            | F.col(reward_col).isNull()
            | (F.abs(F.col(reward_col)) > max_abs_reward)
        ).count()
        if bad:
            raise ValueError(
                f"off_policy_eval: {bad} row(s) with NULLs, propensity "
                f"outside [{min_prob}, 1], or |reward| > {max_abs_reward}"
                " — enforce the positivity floor and reward bounds "
                "upstream"
            )
    w = F.when(
        F.col(match_col).cast("boolean"),
        F.lit(1.0) / F.col(prob_col).cast("double"),
    ).otherwise(F.lit(0.0))
    wc = F.least(w, F.lit(float(clip)))
    r = F.col(reward_col).cast("double")
    dec = "decimal(38,0)"
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(dec)  # noqa: E731
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(match_col).cast("boolean"), 1).otherwise(0)
        ).alias("n_match"),
        F.sum(q(r)).alias("_qr"),
        F.sum(q(w * r)).alias("_qwr"),
        F.sum(q(wc * r)).alias("_qwcr"),
        F.sum(q(w)).alias("_qw"),
        F.sum(q(w * w)).alias("_qww"),
    )
    nd = F.col("n").cast("double")
    un = lambda c: F.col(c).cast("double") / F.lit(1e9)  # noqa: E731
    sw = un("_qw")
    return agg.select(
        *by,
        "n",
        "n_match",
        (un("_qr") / nd).alias("mean_logged_reward"),
        (un("_qwr") / nd).alias("ips"),
        (un("_qwcr") / nd).alias("ips_clipped"),
        F.when(F.col("_qw") > 0, un("_qwr") / sw).alias("snips"),
        F.when(
            F.col("_qww") > 0, (sw * sw) / un("_qww")
        ).alias("ess"),
    )


def fairness_audit(
    df: DataFrame,
    by: list[str],
    group_col: str,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Group-fairness audit (L417): one row per protected group
    ``(by..., group, n, pos_rate, tpr, fpr, precision, dp_gap,
    eo_tpr_gap, eo_fpr_gap, disparate_impact)`` — the bias scoreboard
    for binary decisions (moderation actions, quality filters, loan-
    style accept/reject) next to the accuracy scoreboard (L165/L376
    ask "is it right"; this asks "is it right EQUALLY"):

      per group (exact integer confusion cells, one division each):
        pos_rate  = P(pred=1)            tpr = P(pred=1 | label=1)
        fpr       = P(pred=1 | label=0)  precision = P(label=1|pred=1)
      per (by) panel (repeated on every row so each group reads
      against its context):
        dp_gap            = max pos_rate − min pos_rate
        eo_tpr_gap        = max tpr − min tpr     (equalized odds,
        eo_fpr_gap        = max fpr − min fpr      the two halves)
        disparate_impact  = min pos_rate / max pos_rate (the 80%-rule
                            ratio; NULL when no group selects anyone)

    Groups where a rate is undefined (no positives / no negatives /
    no selections) carry NULL for that rate and are EXCLUDED from its
    gap extremes (documented — a group with no labeled positives
    cannot evidence a TPR gap).  Labels/predictions are validated as
    strictly binary (the L191 loud-refusal discipline); NULL group
    values refused.

    Scale shape: one combinable cell groupBy + one tiny window over
    the group panel.

    No reference counterpart; eval analytics per SURVEY §2.11."""
    from .validate import assert_binary

    assert_binary(df, label_col, "fairness_audit")
    assert_binary(df, pred_col, "fairness_audit")
    if validation_enabled():
        n_null = df.filter(F.col(group_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"fairness_audit: {n_null} NULL group value(s)"
            )
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    cells = df.groupBy(*by, F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).alias("_np"),
        F.sum(y).alias("_ny"),
        F.sum(F.when((y == 1) & (p == 1), 1).otherwise(0)).alias("_tp"),
        F.sum(F.when((y == 0) & (p == 1), 1).otherwise(0)).alias("_fp"),
    )
    nd = F.col("n").cast("double")
    pos_rate = F.col("_np").cast("double") / nd
    tpr = F.when(
        F.col("_ny") > 0,
        F.col("_tp").cast("double") / F.col("_ny").cast("double"),
    )
    fpr = F.when(
        (F.col("n") - F.col("_ny")) > 0,
        F.col("_fp").cast("double")
        / (F.col("n") - F.col("_ny")).cast("double"),
    )
    prec = F.when(
        F.col("_np") > 0,
        F.col("_tp").cast("double") / F.col("_np").cast("double"),
    )
    rated = cells.select(
        *by,
        "group",
        "n",
        pos_rate.alias("pos_rate"),
        tpr.alias("tpr"),
        fpr.alias("fpr"),
        prec.alias("precision"),
    )
    w = Window.partitionBy(*by)
    return rated.select(
        *by,
        "group",
        "n",
        "pos_rate",
        "tpr",
        "fpr",
        "precision",
        (
            F.max("pos_rate").over(w) - F.min("pos_rate").over(w)
        ).alias("dp_gap"),
        (F.max("tpr").over(w) - F.min("tpr").over(w)).alias(
            "eo_tpr_gap"
        ),
        (F.max("fpr").over(w) - F.min("fpr").over(w)).alias(
            "eo_fpr_gap"
        ),
        F.when(
            F.max("pos_rate").over(w) > 0,
            F.min("pos_rate").over(w) / F.max("pos_rate").over(w),
        ).alias("disparate_impact"),
    )


def threshold_curve(
    df: DataFrame,
    by: list[str],
    score_col: str,
    label_col: str,
    thresholds: list[str],
    scale: int = 4,
) -> DataFrame:
    """Threshold calibration curve (L423): one row per pinned
    threshold ``(by..., threshold, tp, fp, fn, tn, precision,
    recall, f1, accuracy)`` — the operating-point table behind every
    dedup/filter/classifier cutoff decision (ROC-AUC L146 and PR-AUC
    L306 integrate over ALL thresholds; shipping needs the table at
    the candidate cutoffs):

    Thresholds are decimal STRINGS and scores are contract-quantized
    to DECIMAL(18, scale) (the L166/L173 discipline), so ``score ≥
    t`` is an EXACT decimal comparison — membership cannot
    knife-edge on an IEEE representation across engines.  Confusion
    cells are exact integers from ONE combinable aggregation over
    all thresholds at once (one scan, no per-threshold pass); each
    rate is one division, NULL when undefined.  Labels validated
    strictly binary (L191); thresholds must be distinct; ≤ 64
    thresholds (bounded panel).

    No reference counterpart; eval analytics per SURVEY §2.11."""
    from decimal import Decimal

    from .validate import assert_binary

    if not thresholds:
        raise ValueError("threshold_curve: thresholds must be non-empty")
    if len(thresholds) > 64:
        raise ValueError("threshold_curve: more than 64 thresholds")
    decs = [Decimal(t) for t in thresholds]
    if len(set(decs)) != len(decs):
        raise ValueError("threshold_curve: duplicate thresholds")
    assert_binary(df, label_col, "threshold_curve")
    if validation_enabled():
        n_null = df.filter(F.col(score_col).isNull()).count()
        if n_null:
            raise ValueError(f"threshold_curve: {n_null} NULL score(s)")
    dec = f"decimal(18,{scale})"
    s = F.col(score_col).cast(dec)
    y = F.col(label_col).cast("int")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, t in enumerate(decs):
        tl = F.lit(str(t)).cast(dec)
        pred = s >= tl
        aggs.append(
            F.sum(F.when(pred & (y == 1), 1).otherwise(0)).alias(
                f"_tp{i}"
            )
        )
        aggs.append(
            F.sum(F.when(pred & (y == 0), 1).otherwise(0)).alias(
                f"_fp{i}"
            )
        )
        aggs.append(F.sum(y).alias(f"_pos{i}"))
    agg = df.groupBy(*by).agg(*aggs)
    rows = []
    for i, t in enumerate(decs):
        tp = F.col(f"_tp{i}")
        fp = F.col(f"_fp{i}")
        fn = F.col(f"_pos{i}") - tp
        tn = F.col("_n") - tp - fp - fn
        rows.append(
            F.struct(
                F.lit(str(t)).cast(dec).alias("threshold"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
            )
        )
    ex = agg.select(*by, F.explode(F.array(*rows)).alias("_r"))
    tp = F.col("_r")["tp"]
    fp = F.col("_r")["fp"]
    fn = F.col("_r")["fn"]
    tn = F.col("_r")["tn"]
    prec = F.when(
        (tp + fp) > 0, tp.cast("double") / (tp + fp).cast("double")
    )
    rec = F.when(
        (tp + fn) > 0, tp.cast("double") / (tp + fn).cast("double")
    )
    f1 = F.when(
        prec.isNull() | rec.isNull(), F.lit(None).cast("double")
    ).when(
        (prec + rec) > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    acc = (tp + tn).cast("double") / (tp + fp + fn + tn).cast("double")
    return ex.select(
        *by,
        F.col("_r")["threshold"].alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
        acc.alias("accuracy"),
    )


def krippendorff_interval(
    df: DataFrame,
    by: list[str],
    unit_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Krippendorff's α, interval metric (L429): ``(by..., n_units,
    n_values, d_o, d_e, alpha)`` — agreement for CONTINUOUS ratings
    (LLM-judge scores, quality grades; the nominal α L238 treats 3
    vs 4 the same as 1 vs 9 — the interval metric weighs by squared
    distance):

        α = 1 − D_o/D_e,  δ²(x, y) = (x−y)²
        Σ_{i≠j∈u} δ² = 2·(m_u·Q_u − S_u²)      (the closed form —
        Σ_{i≠j pooled} δ² = 2·(n·Q − S²)        no pair lattice ever)

    Per-unit disagreements divide by (m_u − 1) — rationals with
    varying denominators — so each unit's term is quantized half-up
    onto the 1e-9 grid and summed as an EXACT decimal (the L390
    discipline); the pooled D_e is exact decimal end to end.  Units
    with fewer than 2 ratings are EXCLUDED (not pairable — the
    standard rule; ``n_values`` counts the pairable ones).  Values
    contract-quantized to DECIMAL(18, scale).  D_e = 0 (every rating
    identical) → NULL α (0/0 — emit the degenerate case, don't
    invent a 1).  NULL units/values refused.

    Scale shape: one (keys, unit) combinable agg + one combinable
    keys agg — fold-free, lattice-free, 100 TB of ratings scans
    once.

    No reference counterpart; agreement analytics per SURVEY §2.11."""
    if validation_enabled():
        n_null = df.filter(
            F.col(unit_col).isNull() | F.col(value_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"krippendorff_interval: {n_null} NULL unit/value row(s)"
            )
    dec = f"decimal(18,{scale})"
    x = F.col(value_col).cast(dec)
    units = df.groupBy(*by, F.col(unit_col).alias("_u")).agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_q"),
    ).filter(F.col("_m") >= 2)
    md = F.col("_m").cast("double")
    term = (
        F.lit(2.0)
        * (
            md * F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s").cast("double")
        )
        / (md - F.lit(1.0))
    )
    qg = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("decimal(38,0)")
    agg = units.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_m").alias("n_values"),
        F.sum(qg).alias("_qdo"),
        F.sum("_s").alias("_st"),
        F.sum("_q").alias("_qt"),
    )
    nd = F.col("n_values").cast("double")
    d_o = F.col("_qdo").cast("double") / F.lit(1e9) / nd
    d_e = (
        F.lit(2.0)
        * (
            nd * F.col("_qt").cast("double")
            - F.col("_st").cast("double") * F.col("_st").cast("double")
        )
        / (nd * (nd - F.lit(1.0)))
    )
    return agg.select(
        *by,
        "n_units",
        "n_values",
        d_o.alias("d_o"),
        d_e.alias("d_e"),
        F.when(d_e > 0, F.lit(1.0) - d_o / d_e).alias("alpha"),
    )


def rater_severity(
    df: DataFrame,
    by: list[str],
    rater_col: str,
    item_col: str,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Rater severity/bias panel (L430): one row per rater ``(by...,
    rater, n_rated, bias, mean_abs_dev, rank)`` — WHO grades hard
    (agreement coefficients L184/L238/L429 say whether the panel
    agrees; this names the harsh and lenient raters — judge-pool
    maintenance for LLM evals and annotation QA):

        consensus for (r, i) = the LEAVE-ONE-OUT mean of the other
        raters on item i (self-contamination excluded):
            loo = (S_i − x_ri)/(n_i − 1)
        bias_r = mean over rated items of (x_ri − loo)
        mean_abs_dev_r = mean |x_ri − loo|

    Items with fewer than 2 ratings are EXCLUDED (no peers, no
    consensus).  Item sums are exact decimals; each (rater, item)
    offset is a rational with a varying denominator, so it is
    quantized half-up onto the 1e-9 grid and summed as EXACT
    decimals per rater (the L390 discipline).  ``rank`` orders by
    (bias DESC, rater ASC) — identical doubles both engines.  NULLs
    refused; duplicate (rater, item) pairs refused (a rater scoring
    one item twice is a data bug).

    Scale shape: one (keys, item) combinable agg joined back to the
    ratings + one (keys, rater) combinable agg + one tiny window.

    No reference counterpart; eval analytics per SURVEY §2.11."""
    if validation_enabled():
        n_null = df.filter(
            F.col(rater_col).isNull()
            | F.col(item_col).isNull()
            | F.col(value_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"rater_severity: {n_null} NULL row(s)")
    if validation_enabled():
        dup = (
            df.groupBy(*by, rater_col, item_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"rater_severity: {dup} duplicate (rater, item) pair(s)"
            )
    dec = f"decimal(18,{scale})"
    base = df.select(
        *by,
        F.col(rater_col).alias("_r"),
        F.col(item_col).alias("_i"),
        F.col(value_col).cast(dec).alias("_x"),
    )
    items = base.groupBy(*by, "_i").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
    ).filter(F.col("_n") >= 2)
    joined = base.join(items, [*by, "_i"])
    loo = (
        F.col("_s").cast("double") - F.col("_x").cast("double")
    ) / (F.col("_n") - F.lit(1)).cast("double")
    off = F.col("_x").cast("double") - loo
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    per_rater = joined.groupBy(*by, F.col("_r").alias("rater")).agg(
        F.count(F.lit(1)).alias("n_rated"),
        F.sum(q(off)).alias("_qb"),
        F.sum(q(F.abs(off))).alias("_qa"),
    )
    nd = F.col("n_rated").cast("double")
    bias = F.col("_qb").cast("double") / F.lit(1e9) / nd
    mad = F.col("_qa").cast("double") / F.lit(1e9) / nd
    w = Window.partitionBy(*by).orderBy(
        F.col("bias").desc(), F.col("rater").asc()
    )
    return per_rater.select(
        *by,
        "rater",
        "n_rated",
        bias.alias("bias"),
        mad.alias("mean_abs_dev"),
    ).withColumn("rank", F.row_number().over(w))


def span_eval(
    pred: DataFrame,
    gold: DataFrame,
    by: list[str],
    key_cols: list[str],
    type_col: str,
) -> DataFrame:
    """Span-level NER/extraction eval (L433): one row per entity type
    ``(by..., type, n_pred, n_gold, tp, precision, recall, f1)`` plus
    an ``__ALL__`` micro row — the seqeval/CoNLL convention made
    relational (a span counts only on EXACT boundary-and-type match;
    partial overlaps are misses).  This is the same contract the
    repo's reference-parity gate enforces on the KG pipeline
    (BENCH/PARITY.md), generalized into a reusable operator for any
    span table:

        tp per type = |pred ∩ gold| on the (key..., type) identity —
        one inner join on exact keys; duplicates collapse first
        (a span predicted twice is one prediction — documented)

    Counts exact integers, one division per rate, F1 the fixed tree,
    NULL-when-undefined; the micro ``__ALL__`` row sums the per-type
    cells (type-blind tp would over-credit boundary matches with the
    WRONG type — the classic seqeval gotcha, pinned by test).  NULL
    keys/types refused.

    Scale shape: two distinct-collapses + one equi-join + combinable
    aggs.

    No reference counterpart (generalizes the repo's own parity
    harness); eval analytics per SURVEY §2.11."""
    for d, nm in ((pred, "pred"), (gold, "gold")):
        bad = F.col(type_col).isNull()
        for c in key_cols:
            bad = bad | F.col(c).isNull()
        if validation_enabled():
            n_null = d.filter(bad).count()
            if n_null:
                raise ValueError(
                    f"span_eval: {n_null} NULL key/type row(s) in {nm}"
                )
    p = pred.select(
        *by, *key_cols, F.col(type_col).alias("_t")
    ).distinct()
    g = gold.select(
        *by, *key_cols, F.col(type_col).alias("_t")
    ).distinct()
    tp = (
        p.join(g, [*by, *key_cols, "_t"])
        .groupBy(*by, "_t")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    np_ = p.groupBy(*by, "_t").agg(F.count(F.lit(1)).alias("n_pred"))
    ng = g.groupBy(*by, "_t").agg(F.count(F.lit(1)).alias("n_gold"))
    cells = (
        np_.join(ng, [*by, "_t"], "full_outer")
        .join(tp, [*by, "_t"], "left")
        .select(
            *by,
            F.col("_t").alias("type"),
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
            F.coalesce(F.col("n_gold"), F.lit(0)).alias("n_gold"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        )
    )
    micro = cells.groupBy(*by).agg(
        F.lit("__ALL__").alias("type"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_gold").alias("n_gold"),
        F.sum("tp").alias("tp"),
    ).select(*by, "type", "n_pred", "n_gold", "tp")
    allrows = cells.unionByName(micro)
    prec = F.when(
        F.col("n_pred") > 0,
        F.col("tp").cast("double") / F.col("n_pred").cast("double"),
    )
    rec = F.when(
        F.col("n_gold") > 0,
        F.col("tp").cast("double") / F.col("n_gold").cast("double"),
    )
    f1 = F.when(
        prec.isNull() | rec.isNull(), F.lit(None).cast("double")
    ).when((prec + rec) > 0, F.lit(2.0) * prec * rec / (prec + rec)).otherwise(
        F.lit(0.0)
    )
    return allrows.select(
        *by,
        "type",
        "n_pred",
        "n_gold",
        "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )


def prediction_churn(
    df: DataFrame,
    by: list[str],
    old_col: str,
    new_col: str,
) -> DataFrame:
    """Prediction-churn panel (L434): one row per (old, new) class
    pair ``(by..., old_label, new_label, n, frac, churn_rate,
    net_drift_old, net_drift_new)`` — the model-ROLLOUT safety
    scoreboard (accuracy deltas hide it: two models can match a gold
    set equally while disagreeing on a third of traffic; churn is
    what users and downstream caches feel):

        flip matrix: exact counts per (old, new) label pair, frac =
        n/total; churn_rate = Σ off-diagonal / total (repeated per
        row); net_drift_* = (new-model volume − old-model volume)
        of that row's labels — which classes GREW (repeated per row
        so every pair reads in context)

    All exact integer counts from ONE combinable groupBy + two tiny
    margin joins; one division each.  NULL predictions refused (a
    missing prediction is an availability incident, not a class).

    No reference counterpart; eval analytics per SURVEY §2.11."""
    if validation_enabled():
        n_null = df.filter(
            F.col(old_col).isNull() | F.col(new_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"prediction_churn: {n_null} NULL prediction(s)"
            )
    cells = df.groupBy(
        *by,
        F.col(old_col).cast("string").alias("old_label"),
        F.col(new_col).cast("string").alias("new_label"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(*by)
    total = F.sum("n").over(w)
    churn = F.sum(
        F.when(F.col("old_label") != F.col("new_label"), F.col("n")).otherwise(
            0
        )
    ).over(w)
    old_m = cells.groupBy(*by, F.col("old_label").alias("_l")).agg(
        F.sum("n").alias("_old_n")
    )
    new_m = cells.groupBy(*by, F.col("new_label").alias("_l")).agg(
        F.sum("n").alias("_new_n")
    )
    margins = old_m.join(new_m, [*by, "_l"], "full_outer").select(
        *by,
        "_l",
        (
            F.coalesce(F.col("_new_n"), F.lit(0))
            - F.coalesce(F.col("_old_n"), F.lit(0))
        ).alias("_drift"),
    )
    staged = cells.select(
        *by,
        "old_label",
        "new_label",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias(
            "frac"
        ),
        (churn.cast("double") / total.cast("double")).alias(
            "churn_rate"
        ),
    )
    out = staged.join(
        margins.withColumnRenamed("_l", "old_label").withColumnRenamed(
            "_drift", "net_drift_old"
        ),
        [*by, "old_label"],
    ).join(
        margins.withColumnRenamed("_l", "new_label").withColumnRenamed(
            "_drift", "net_drift_new"
        ),
        [*by, "new_label"],
    )
    return out.select(
        *by,
        "old_label",
        "new_label",
        "n",
        "frac",
        "churn_rate",
        "net_drift_old",
        "net_drift_new",
    )
