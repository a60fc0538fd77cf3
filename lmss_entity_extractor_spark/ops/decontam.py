"""Benchmark decontamination (L35): flag and drop training documents
that share word n-grams with an evaluation/benchmark set — the GPT-3
appendix-C / C4-style pipeline step that keeps eval answers out of the
training corpus.

Scale shape: the benchmark side is tiny relative to the corpus (eval
sets are thousands of documents, the corpus is the 100 TB side), so its
distinct n-gram hash set broadcasts and the corpus is scanned ONCE —
explode distinct full-window n-grams, hash, broadcast-hash-join; no
shuffle touches the corpus except the per-doc count aggregation (map-
side combinable).  Join keys are 64-bit xxhash64 of the n-gram, not the
string (~4x fewer bytes; collision caveat as in ops/dedup.py).

Semantics: only FULL n-token windows count (a document shorter than
``n`` tokens has no n-grams — the standard decontamination rule, and
the shape DuckDB's list comprehension reproduces exactly for the
oracle; ops/dedup.py's shingles deliberately keep short-doc partial
shingles for near-dup recall, which is why this module has its own
window builder).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens


def _full_window_grams(toks: Column, n: int, distinct: bool = False) -> Column:
    """Full-window word n-grams of a token array (array<string>); empty
    array for fewer than ``n`` tokens.  ``distinct=True`` dedups the
    grams (the decontamination shape); ``distinct=False`` keeps repeats
    (the repetition-counting shape).  The single source of the
    full-window rule shared by decontam and repetition."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def _full_ngrams(text_col: str, n: int) -> Column:
    """Distinct full-window word n-grams (array<string>); empty array
    for texts with fewer than ``n`` tokens."""
    return _full_window_grams(_tokens(text_col), n, distinct=True)


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, n_hits, n_doc_shingles): training docs sharing at least
    ``min_hits`` distinct word n-grams with the benchmark set.

    ``n_hits`` counts the doc's distinct n-grams that appear anywhere in
    the benchmark; ``n_doc_shingles`` its total distinct n-grams, so
    ``n_hits / n_doc_shingles`` is the contamination fraction a caller
    can threshold on.  ``broadcast_benchmark=False`` drops the broadcast
    hint for benchmark sets too large for executor memory (falls back to
    a shuffle join on the hash)."""
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_full_ngrams(text_col, n)).alias("shingle"),
        )
        .filter(F.length("shingle") > 0)
        .select("doc_id", F.xxhash64("shingle").alias("sh_h"))
    )
    bench = (
        benchmark.select(F.explode(_full_ngrams(bench_text_col, n)).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .select(F.xxhash64("shingle").alias("sh_h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # ONE corpus scan: a broadcast LEFT join marks hits inline and a
    # single map-side-combinable aggregation produces both counts —
    # splitting sizes and hits into two consumers of the exploded frame
    # would scan (and re-explode) the 100 TB side twice
    per_doc = (
        d.join(bench, "sh_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_doc_shingles"),
            F.count("_hit").alias("n_hits"),  # count() skips nulls
        )
    )
    return per_doc.filter(F.col("n_hits") >= min_hits).select(
        "doc_id", "n_hits", "n_doc_shingles"
    )


def remove_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The corpus minus its contaminated documents (left-anti join on
    the flagged id set) — the curation-pipeline form of the check."""
    flagged = contaminated_docs(
        docs,
        benchmark,
        n=n,
        min_hits=min_hits,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        broadcast_benchmark=broadcast_benchmark,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(flagged, id_col, "left_anti")
