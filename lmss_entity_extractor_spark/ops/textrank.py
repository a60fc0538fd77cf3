"""TextRank keyword extraction (L118): Mihalcea & Tarau (EMNLP 2004)
— rank words by PageRank over the word co-occurrence graph, the
classic unsupervised keyword extractor — composed from two operators
this repo already trusts: a shuffle-free windowed pair mint and
``graph/pagerank.py``.

Graph construction is ONE projection, no self-join: each document's
token array pairs with itself through nested ``transform``/``slice``
higher-order expressions (token i meets tokens i+1..i+window), all
whole-stage codegen; corpus-level dedup to the classic UNWEIGHTED
undirected graph (an edge exists if the pair co-occurs anywhere — set
semantics, same stance as cooccur's distinct projection) is one
distinct on (least, greatest).  PageRank then runs on both directions
of each undirected edge.

Scale: the pair mint is linear in total tokens × window (executor-side
explode, no exchange); the distinct and the PageRank iterations shuffle
on words — vocabulary-sized, orders of magnitude below corpus-sized.
Tokenization is the repo's lowercase-alpha regex split (`[^a-z]+`,
min length) — documented as the deterministic baseline tokenizer, same
family as textstats.

Float discipline inherited from PageRank: ranks compare on the
floor-1e6 grid, and top-k selection orders by (gridded rank DESC,
word) so rank ties resolve deterministically on BOTH engines.

No reference counterpart; keyword extraction extends the text-analysis
family (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph.pagerank import pagerank


def cooccurrence_word_edges(
    docs: DataFrame,
    text_col: str,
    window: int = 2,
    min_len: int = 2,
) -> DataFrame:
    """The distinct undirected word co-occurrence pairs ``(word_a,
    word_b)`` with word_a < word_b — tokens within ``window`` positions
    in any document."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if text_col not in docs.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) >= min_len,
    )
    # token i pairs with tokens i+1..i+window (slice is 1-based: the
    # successor of 0-based index i starts at position i+2)
    pairs = F.flatten(
        F.transform(
            toks,
            lambda x, i: F.transform(
                F.slice(toks, i + F.lit(2), F.lit(window)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        docs.select(F.explode(pairs).alias("p"))
        .filter(F.col("p.a") != F.col("p.b"))
        .select(
            F.least("p.a", "p.b").alias("word_a"),
            F.greatest("p.a", "p.b").alias("word_b"),
        )
        .distinct()
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str,
    k: int = 10,
    window: int = 2,
    n_iters: int = 10,
    damping: float = 0.85,
    min_len: int = 2,
) -> DataFrame:
    """Top-``k`` corpus keywords: ``(word, rank6)`` — PageRank over the
    undirected co-occurrence graph, ranks on the floor-1e6 grid,
    (rank6 DESC, word) deterministic order."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    und = cooccurrence_word_edges(docs, text_col, window=window, min_len=min_len)
    edges = und.select(
        F.col("word_a").alias("src"), F.col("word_b").alias("dst")
    ).unionByName(
        und.select(F.col("word_b").alias("src"), F.col("word_a").alias("dst"))
    )
    pr = pagerank(edges, n_iters=n_iters, damping=damping)
    return (
        pr.select(
            F.col("node").alias("word"),
            (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank6"),
        )
        .orderBy(F.col("rank6").desc(), F.col("word").asc())
        .limit(k)
    )


def rake_keywords(
    df: DataFrame,
    by: list[str],
    text_col: str,
    stopwords: list[str],
    top_k: int = 10,
    max_phrase: int = 4,
) -> DataFrame:
    """RAKE keyword extraction (L419): ``(by..., phrase, n_words,
    score, rank)`` — Rapid Automatic Keyword Extraction (Rose et al.
    2010), the degree/frequency member of the keyword family
    (TextRank L118 walks a co-occurrence graph, TF-IDF L358 weighs
    corpus rarity; RAKE scores stopword-delimited PHRASES — the
    multi-word terms the other two fragment):

        candidate phrases = maximal stopword/punctuation-free token
        runs (pinned normalization: lowercase, leading/trailing
        non-alphanumerics stripped; empty tokens delimit); runs
        longer than ``max_phrase`` are DISCARDED (documented — they
        are boilerplate, not keywords)
        word scores: deg(w)/freq(w) over the candidate set, exact
        integer degree (Σ phrase length over phrases containing w)
        and frequency
        phrase score = Σ word scores, folded in phrase-word order
        (pinned — identical IEEE sum both engines)

    Top-k distinct phrases per group by (score DESC, phrase ASC) —
    scores are identical doubles cross-engine (exact-integer ratios
    summed in pinned order), so the ranking cannot knife-edge.  The
    stopword list is a CALLER parameter pinned into the plan as a
    literal array (language lists are a modeling choice, not an
    engine default); empty list refused.

    Scale shape: one phrase explode + one word explode + two
    combinable aggs + one broadcast-back join + one bounded top-k
    window.

    No reference counterpart; text analytics per SURVEY §2.11."""
    if not stopwords:
        raise ValueError("rake_keywords: stopwords must be non-empty")
    if not (1 <= max_phrase <= 8):
        raise ValueError("rake_keywords: max_phrase must be in 1..8")
    if top_k < 1:
        raise ValueError("rake_keywords: top_k must be >= 1")
    sw = F.array(*[F.lit(w.lower()) for w in sorted(set(stopwords))])
    norm = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.regexp_replace(
            F.regexp_replace(t, r"^[^a-z0-9]+", ""), r"[^a-z0-9]+$", ""
        ),
    )
    # delimiter-preserving split: mark stopwords/empties as '\x00'
    marked = F.transform(
        norm,
        lambda t: F.when(
            (t == "") | F.array_contains(sw, t), F.lit("\x00")
        ).otherwise(t),
    )
    joined = F.array_join(marked, " ")
    phrases = F.filter(
        F.transform(
            F.split(joined, "\x00"),
            lambda p: F.trim(p),
        ),
        lambda p: p != "",
    )
    ph = df.select(*by, F.explode(phrases).alias("phrase")).withColumn(
        "_words", F.split(F.col("phrase"), " ")
    ).withColumn("n_words", F.size("_words")).filter(
        F.col("n_words") <= max_phrase
    )
    words = ph.select(
        *by, "n_words", F.explode("_words").alias("_w")
    )
    wstats = words.groupBy(*by, "_w").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("n_words").alias("_deg"),
    )
    scored_words = wstats.select(
        *by,
        "_w",
        (
            F.col("_deg").cast("double") / F.col("_freq").cast("double")
        ).alias("_ws"),
    )
    ph_types = ph.select(*by, "phrase", "n_words").distinct()
    pw = ph_types.select(
        *by, "phrase", "n_words", F.posexplode(
            F.split(F.col("phrase"), " ")
        ).alias("_i", "_w")
    ).join(scored_words, [*by, "_w"])
    pscore = pw.groupBy(*by, "phrase", "n_words").agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_i", "_ws"))
                ),
                lambda s: s["_ws"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score")
    )
    w_rank = Window.partitionBy(*by).orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        pscore.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_k)
        .select(*by, "phrase", "n_words", "score", "rank")
    )
