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

from pyspark.sql import DataFrame, functions as F

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
