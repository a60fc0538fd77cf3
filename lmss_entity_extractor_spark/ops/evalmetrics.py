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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
