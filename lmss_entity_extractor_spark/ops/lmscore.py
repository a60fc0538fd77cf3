"""Unigram-LM quality scoring (L39): the CCNet-style perplexity filter
(Wenzek et al. 2020 §3.3) with the KenLM model replaced by an add-alpha
unigram LM trained on a reference corpus — the classic curation signal
"how surprising is this document under a clean-corpus language model".

Reference scope: the reference app scores candidate mentions only
(app/lmss_classification.py); corpus-level quality scoring is part of
the training-data-curation surface SURVEY §2.11 mandates.

Model. Vocabulary = top ``vocab_size`` tokens of the reference corpus by
(count DESC, token ASC) — a deterministic cap that bounds the broadcast
side no matter how large the training corpus is.  With N = total count
over the kept vocabulary, V = kept vocabulary size, and alpha-smoothing
over V+1 classes (the +1 absorbs out-of-vocabulary mass):

    logp(t in vocab) = ln(c_t + alpha) - ln(N + alpha*(V+1))
    logp(OOV)        = ln(alpha)       - ln(N + alpha*(V+1))

Per document: cross_entropy = -(sum_t m_t * logp(t)) / n_tokens (nats),
perplexity = exp(cross_entropy); empty documents score (0.0, 1.0).

Scale shape. Training is one map-side-combinable ``groupBy(token)`` plus
a TakeOrdered top-V — no all-pairs; the resulting LM is BOUNDED
(<= vocab_size rows) and is collected exactly once, so the corpus-wide
scalars (N, V) fold into literals and the training scan runs a single
time (keeping it lazy would re-run the full-corpus aggregation for the
stats subtree and again for the join).  Scoring shuffles (doc_id,
token) multiplicities once (combinable), broadcast-joins the LM, then
aggregates per document.

Determinism contract (for the DuckDB oracle): the per-document log-prob
sum is NOT a floating ``SUM()`` (whose addend order is partition-
dependent) — it is a left-associative fold over the document's distinct
tokens in sorted order (``array_sort`` + ``aggregate`` here,
``list_sort`` + ``list_reduce`` in the oracle), so both engines add the
same doubles in the same order.  The remaining cross-engine delta is at
most 1 ulp in ``ln``/``exp`` libm rounding, far inside the checker's
9-significant-digit normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.dedup import _clean_tokens
from .validate import validation_enabled


def train_unigram_lm(
    corpus: DataFrame,
    vocab_size: int = 65536,
    text_col: str = "text",
) -> DataFrame:
    """(token, c) for the top ``vocab_size`` tokens of ``corpus`` by
    (count DESC, token ASC).  One combinable aggregation + TakeOrdered;
    the result is the broadcastable LM table for :func:`lm_quality_score`."""
    return (
        corpus.select(F.explode(_clean_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
    )


def lm_quality_score(
    docs: DataFrame,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM quality: doc_id, n_tokens, n_oov, cross_entropy
    (nats), perplexity.  ``lm`` defaults to a model trained on ``docs``
    itself (self-scoring — the standard "rank the corpus" mode); pass a
    :func:`train_unigram_lm` table from a clean reference corpus for
    CCNet-style filtering."""
    # Materialize the LM ONCE: it is bounded (train_unigram_lm caps it
    # at vocab_size rows; an externally passed lm must be similarly
    # bounded — it is a vocabulary, not a corpus).  Re-using the lazy
    # plan instead would re-run the full-corpus training aggregation
    # for the N/V stats AND again for the scoring join — a doubled
    # 100 TB scan in self-scoring mode.
    if lm is None:
        lm = train_unigram_lm(docs, vocab_size=vocab_size, text_col=text_col)
    vocab = [(r["token"], int(r["c"])) for r in lm.select("token", "c").collect()]
    n_total = float(sum(c for _, c in vocab))
    denom = F.log(F.lit(n_total) + F.lit(alpha) * (F.lit(float(len(vocab))) + F.lit(1.0)))
    spark = docs.sparkSession
    lm_local = spark.createDataFrame(vocab, "token string, c bigint")
    ids = docs.select(F.col(id_col).alias("doc_id"))
    mult = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_clean_tokens(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    scored = mult.join(F.broadcast(lm_local), "token", "left").select(
        "doc_id",
        "token",
        "m",
        (
            F.when(F.col("c").isNotNull(), F.log(F.col("c") + F.lit(alpha)))
            .otherwise(F.log(F.lit(alpha)))
            - denom
        ).alias("logp"),
        F.col("c").isNull().alias("oov"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("m").alias("n_tokens"),
        F.sum(F.when(F.col("oov"), F.col("m")).otherwise(F.lit(0))).alias("n_oov"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "m", "logp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["m"].cast("double") * x["logp"],
        ).alias("_lp"),
    )
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.coalesce(-F.col("_lp") / F.col("n_tokens"), F.lit(0.0)).alias("cross_entropy"),
        F.coalesce(F.exp(-F.col("_lp") / F.col("n_tokens")), F.lit(1.0)).alias("perplexity"),
    )


def lm_quality_filter(
    docs: DataFrame,
    max_perplexity: float,
    lm: DataFrame | None = None,
    alpha: float = 0.5,
    vocab_size: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus minus documents whose perplexity under the LM exceeds
    ``max_perplexity`` (an absolute threshold — deterministic, unlike a
    quantile cut).  Implemented as a broadcast-friendly semi-join on the
    scored ids; all original columns pass through."""
    keep = lm_quality_score(
        docs, lm=lm, alpha=alpha, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    ).filter(F.col("perplexity") <= F.lit(max_perplexity)).select("doc_id")
    return docs.join(
        keep.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )


def bigram_lm_score(
    df: DataFrame,
    by: list[str],
    id_col: str,
    text_col: str,
    k: float = 0.1,
) -> DataFrame:
    """Bigram-LM fluency score (L421): ``(by..., doc, n_pairs,
    cross_entropy, ppl)`` — the word-ORDER member of the LM-quality
    family (the L39 unigram filter scores vocabulary; shuffled or
    mashed text sails through it — the bigram conditional sees the
    sequence):

        logp(w₂|w₁) = ln( (c₂(w₁,w₂) + k) / (c₁(w₁) + k·V) )
        H(doc) = −(1/m)·Σ logp over its m = len−1 adjacent pairs
        ppl = exp(H)

    Self-trained per group (each doc scored against its OWN group's
    bigram table — the curation shape: outliers are the interesting
    rows), add-k smoothing with k a pinned literal, context counts
    c₁ = Σ_w c₂(w₁,w) (so contexts are always seen under
    self-training), V = the group's distinct vocabulary.  All counts
    EXACT integers; each pair's logp is one fixed tree whose ln is a
    per-pair transcendental quantized half-up onto the 1e-9 grid
    before the EXACT per-doc decimal sum (the L390 discipline — the
    per-doc float sum order would otherwise be engine-dependent).
    Pinned lowercase-whitespace tokenization (the L389 contract).
    Docs with < 2 tokens → NULL scores (no pairs to score); NULL
    ids/texts refused.

    Scale shape: one pair explode + combinable counts, one keyed
    join of doc pairs against the group bigram table, one combinable
    per-doc agg.

    No reference counterpart; curation analytics per SURVEY §2.11."""
    if k <= 0:
        raise ValueError("bigram_lm_score: k must be > 0")
    if validation_enabled():
        n_null = df.filter(
            F.col(id_col).isNull() | F.col(text_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"bigram_lm_score: {n_null} NULL row(s)")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = df.select(
        *by, F.col(id_col).alias("_doc"), toks.alias("_t")
    )
    pairs_arr = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("_t")),
            lambda i: F.struct(
                F.element_at(F.col("_t"), i - 1).alias("w1"),
                F.element_at(F.col("_t"), i).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_pairs = base.select(
        *by, "_doc", F.explode(pairs_arr).alias("_p")
    ).select(*by, "_doc", F.col("_p")["w1"].alias("_w1"), F.col("_p")["w2"].alias("_w2"))
    c2 = doc_pairs.groupBy(*by, "_w1", "_w2").agg(
        F.count(F.lit(1)).alias("_c2")
    )
    c1 = c2.groupBy(*by, "_w1").agg(F.sum("_c2").alias("_c1"))
    vocab = base.select(*by, F.explode("_t").alias("_w")).groupBy(
        *by
    ).agg(F.countDistinct("_w").alias("_v"))
    lm = c2.join(c1, [*by, "_w1"])
    lm = (
        lm.join(vocab, list(by))
        if by
        else lm.crossJoin(F.broadcast(vocab))
    )
    kd = F.lit(float(k))
    logp = F.log(
        (F.col("_c2").cast("double") + kd)
        / (F.col("_c1").cast("double") + kd * F.col("_v").cast("double"))
    )
    lm_scored = lm.select(*by, "_w1", "_w2", logp.alias("_lp"))
    joined = doc_pairs.join(lm_scored, [*by, "_w1", "_w2"])
    dec = "decimal(38,0)"
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(dec)  # noqa: E731
    per_doc = joined.groupBy(*by, F.col("_doc").alias("doc")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(q(F.col("_lp"))).alias("_qs"),
    )
    docs_all = base.select(*by, F.col("_doc").alias("doc")).distinct()
    out = docs_all.join(per_doc, [*by, "doc"], "left")
    h = -(
        F.col("_qs").cast("double")
        / F.lit(1e9)
        / F.col("n_pairs").cast("double")
    )
    return out.select(
        *by,
        "doc",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        F.when(F.col("n_pairs") > 0, h).alias("cross_entropy"),
        F.when(F.col("n_pairs") > 0, F.exp(h)).alias("ppl"),
    )


def oov_panel(
    df: DataFrame,
    by: list[str],
    group_col: str,
    ref_label: str,
    probe_label: str,
    text_col: str,
) -> DataFrame:
    """Vocabulary-overlap / OOV panel (L422): ``(by..., n_ref_types,
    n_probe_types, n_probe_tokens, type_oov, token_oov,
    jaccard_types)`` — how much of corpus B's vocabulary does corpus
    A's miss (tokenizer-domain shift, fine-tune corpus checks,
    retrieval-index staleness): type-level OOV (share of B's DISTINCT
    words absent from A), token-level OOV (share of B's RUNNING text
    absent from A — the number that predicts tokenizer fertility
    blow-up), and the type Jaccard for symmetry.  All EXACT integer
    counts from two scans + one anti-join shape, one division per
    output — bit-identical ungridded.  Pinned lowercase-whitespace
    tokenization (the L389 contract); an empty side → NULL its
    ratios.

    No reference counterpart; curation analytics per SURVEY §2.11
    (the corpus-level complement of doc-level containment L171)."""
    flt = df.filter(
        F.col(text_col).isNotNull()
        & F.col(group_col).isin([ref_label, probe_label])
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    words = flt.select(
        *by,
        (F.col(group_col) == ref_label).alias("_is_ref"),
        F.explode(toks).alias("_w"),
    )
    per_word = words.groupBy(*by, "_w").agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0)).alias("_cr"),
        F.sum(F.when(~F.col("_is_ref"), 1).otherwise(0)).alias("_cp"),
    )
    agg = per_word.groupBy(*by).agg(
        F.sum(F.when(F.col("_cr") > 0, 1).otherwise(0)).alias(
            "n_ref_types"
        ),
        F.sum(F.when(F.col("_cp") > 0, 1).otherwise(0)).alias(
            "n_probe_types"
        ),
        F.sum("_cp").alias("n_probe_tokens"),
        F.sum(
            F.when((F.col("_cp") > 0) & (F.col("_cr") == 0), 1).otherwise(
                0
            )
        ).alias("_oov_types"),
        F.sum(
            F.when(F.col("_cr") == 0, F.col("_cp")).otherwise(0)
        ).alias("_oov_tokens"),
        F.sum(
            F.when((F.col("_cp") > 0) & (F.col("_cr") > 0), 1).otherwise(
                0
            )
        ).alias("_inter"),
    )
    union_types = (
        F.col("n_ref_types") + F.col("n_probe_types") - F.col("_inter")
    )
    return agg.select(
        *by,
        "n_ref_types",
        "n_probe_types",
        "n_probe_tokens",
        F.when(
            F.col("n_probe_types") > 0,
            F.col("_oov_types").cast("double")
            / F.col("n_probe_types").cast("double"),
        ).alias("type_oov"),
        F.when(
            F.col("n_probe_tokens") > 0,
            F.col("_oov_tokens").cast("double")
            / F.col("n_probe_tokens").cast("double"),
        ).alias("token_oov"),
        F.when(
            union_types > 0,
            F.col("_inter").cast("double") / union_types.cast("double"),
        ).alias("jaccard_types"),
    )
