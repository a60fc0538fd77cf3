"""Data Selection via Importance Resampling (L41): DSIR (Xie et al.
2023) — score every raw-corpus document by how target-like it is under
two bag-of-hashed-n-gram unigram models, then keep the top-k.

    log w(x) = sum_b  c_b(x) * ( log p_target(b) - log q_raw(b) )

Features are word uni+bigrams hashed into ``m`` buckets (the paper's
feature space; collisions are PART of the model, so the bucket hash must
be identical on every engine — md5-prefix, the same portable family as
``ops/dedup.py``).  Bucket models are add-alpha-smoothed multinomials
over the m buckets.  Selection here is deterministic top-k by
(log_weight DESC, id ASC); the paper's Gumbel-top-k sampled variant
differs only in adding hash-seeded noise before the same top-k and is
noted, not implemented — the deterministic form is the one an oracle can
re-derive exactly.

Reference scope: the reference app has no corpus curation; DSIR is part
of the training-data-curation surface SURVEY §2.11 mandates for the
100 TB corpus path, composing with L39 (perplexity filter) and L36
(mixture sampling).

Scale shape (100 TB raw corpus):
  * training both models = one explode + map-side-combinable
    groupBy(bucket) each; the result is <= m rows (m ~ 10^4) — tiny;
  * scoring = one corpus scan: explode -> per-(doc,bucket) counts (one
    keyed shuffle, combinable) -> two BROADCAST joins against the <= m-row
    count tables -> per-doc fold.  Nothing joins corpus x corpus;
  * the per-doc log-weight is a left-associated fold over bucket-sorted
    (bucket, count, lambda) structs — the ONLY float sum, and its addend
    order is pinned on both engines (the L39 discipline);
  * top-k via TakeOrderedAndProject is fine for contract-sized k; at
    selection ratios where k itself is huge, cut by a weight threshold
    (approx_percentile on log_weight) instead — noted in dsir_select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decontam import _full_window_grams
from .dedup import _clean_tokens


def hashed_ngram_buckets(text_col: str, m: int = 512, ns: tuple[int, ...] = (1, 2)) -> Column:
    """Array of hashed-n-gram bucket ids (repeats kept — these are
    counts, not sets): full-window word n-grams for each n in ``ns``,
    each hashed to ``int(md5(gram)[:8], 16) % m``.  md5-prefix keeps the
    bucket function bit-identical across Spark and the SQL oracle."""
    toks = _clean_tokens(text_col)
    grams = F.concat(*[_full_window_grams(toks, n, distinct=False) for n in ns])
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % m,
    )


def train_hashed_ngram_counts(
    docs: DataFrame,
    m: int = 512,
    ns: tuple[int, ...] = (1, 2),
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cnt) — raw bucket frequencies of a corpus; <= m rows,
    map-side combinable.  Feed two of these (target corpus, raw corpus)
    to :func:`dsir_logweights`."""
    return (
        docs.select(F.explode(hashed_ngram_buckets(text_col, m=m, ns=ns)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_logweights(
    docs: DataFrame,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    m: int = 512,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per doc: (doc_id, n_grams, log_weight).

    lambda_b = (ln(p_cnt+alpha) - ln(p_tot+alpha*m))
             - (ln(q_cnt+alpha) - ln(q_tot+alpha*m)), missing buckets
    count 0; log_weight = sum over the doc's buckets of c_b * lambda_b,
    folded in bucket order (array_sort + aggregate — addend order
    pinned), then snapped to the 1e-9 grid (floor(x·1e9 + 0.5)/1e9 —
    the bigram_lm logp discipline): the JVM and C libm disagree by 1
    ulp on some ln inputs, and the cancelling fold amplifies that past
    any exact-compare tolerance (r5 strict sweep).  A doc with no
    grams scores 0.0.  The count tables are <= m
    rows: both joins broadcast, and the totals ride in as 1-row
    broadcast cross joins so the whole program stays lazy (no driver
    collect between training and scoring)."""
    ids = docs.select(F.col(id_col).alias("doc_id"))
    db = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(hashed_ngram_buckets(text_col, m=m, ns=ns)).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    p_tot = target_counts.agg(F.sum("cnt").cast("double").alias("p_tot"))
    q_tot = raw_counts.agg(F.sum("cnt").cast("double").alias("q_tot"))
    lam = (
        (F.log(F.coalesce(F.col("p_cnt"), F.lit(0)) + F.lit(alpha)) - F.log(F.col("p_tot") + F.lit(alpha * m)))
        - (F.log(F.coalesce(F.col("q_cnt"), F.lit(0)) + F.lit(alpha)) - F.log(F.col("q_tot") + F.lit(alpha * m)))
    ).alias("lam")
    scored = (
        db.join(F.broadcast(target_counts.withColumnRenamed("cnt", "p_cnt")), "bucket", "left")
        .join(F.broadcast(raw_counts.withColumnRenamed("cnt", "q_cnt")), "bucket", "left")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
        .select("doc_id", "bucket", "cb", lam)
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("cb").alias("n_grams"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("bucket", F.col("cb").cast("double").alias("cb"), "lam"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["cb"] * x["lam"],
        ).alias("log_weight"),
    )
    grid = F.floor(F.col("log_weight") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce(grid, F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    m: int = 512,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ``k`` most target-like raw docs: all of ``raw``'s columns plus
    (n_grams, log_weight), ordered top-k by (log_weight DESC, id ASC —
    exact-duplicate texts score identically, so the id tiebreak is
    load-bearing).  Trains both bucket models internally; pre-trained
    counts go through :func:`dsir_logweights` directly.

    orderBy+limit compiles to TakeOrderedAndProject (per-partition heaps,
    no global sort).  When the selected set itself is too big for top-k
    (billions of docs), cut by a log_weight >= t threshold with t from
    approx_percentile and skip the ordering entirely."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = dsir_logweights(
        raw,
        train_hashed_ngram_counts(target, m=m, ns=ns, text_col=text_col),
        train_hashed_ngram_counts(raw, m=m, ns=ns, text_col=text_col),
        m=m,
        ns=ns,
        alpha=alpha,
        text_col=text_col,
        id_col=id_col,
    )
    top = w.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(k)
    return raw.join(
        F.broadcast(top).withColumnRenamed("doc_id", id_col), id_col
    )
