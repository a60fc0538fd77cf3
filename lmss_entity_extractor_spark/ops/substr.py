"""Exact-substring deduplication (L42): the scalable approximation of
Lee et al. 2021's ExactSubstr ("Deduplicating Training Data Makes
Language Models Better") — find token runs that occur more than once in
the corpus and remove them from the training text.

The paper builds a corpus-wide suffix array; the distributed
re-expression rests on the covering property: every duplicated substring
of >= ``min_len`` tokens contains at least one duplicated ``min_len``-
token window, so the union of duplicated-window positions covers exactly
the duplicated regions (it can only over-extend a run by < min_len
tokens at each edge — the standard trade for an embarrassingly-parallel
formulation).  All arithmetic is integer (positions, counts): no float
discipline needed anywhere, so the SQL oracle is a direct re-derivation.

Scale shape (100 TB):
  * one corpus scan explodes (doc, pos, gram) windows; counting grams is
    a map-side-combinable groupBy on xxhash64(gram) (8-byte keys, not
    strings; collision caveat as ops/dedup.py);
  * the duplicated-hash set joins back by hash — a keyed shuffle equi-
    join, NOT a broadcast: at web scale the duplicated set is itself
    huge (boilerplate), and AQE can still decide to broadcast when it
    happens to be small;
  * span assembly is the gaps-and-islands window per doc — one keyed
    shuffle on doc_id, bounded state;
  * removal rebuilds text from the token array with one higher-order
    ``filter``/``exists`` over the doc's (few) spans — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .decontam import _full_window_grams
from .dedup import _clean_tokens


def duplicated_substring_spans(
    docs: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated token runs: one row per merged span —
    (doc_id, tok_start, tok_end, n_windows), ``tok_end`` exclusive,
    positions over the whitespace token stream.

    A window counts as duplicated when its exact ``min_len``-token text
    occurs >= ``min_count`` times corpus-wide (a doc repeating itself
    counts — self-repetition is a duplicated substring in the paper
    too).  Overlapping and abutting duplicated windows merge into one
    span (gaps-and-islands: a window starting past every previous
    window's end opens a new island)."""
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 would flag every window)")
    toks = _clean_tokens(text_col)
    windows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_full_window_grams(toks, min_len, distinct=False)).alias("pos", "gram"),
    ).select("doc_id", "pos", F.xxhash64("gram").alias("gh"))
    dup = (
        windows.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("gh")
    )
    flagged = windows.join(dup, "gh").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + min_len).alias("e")
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    return (
        flagged.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("s").alias("tok_start"),
            F.max("e").alias("tok_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("grp")
    )


def remove_duplicated_substrings(
    docs: DataFrame,
    min_len: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus with every duplicated token run cut out of
    ``text_col`` (tokens re-joined with single spaces — the tokenizer is
    whitespace-lossy by design, like the paper's token-level cuts);
    all other columns pass through.  Docs that are one big duplicated
    run come back with '' — keep them visible for auditing; drop with a
    trailing filter if desired."""
    spans = (
        duplicated_substring_spans(
            docs, min_len=min_len, min_count=min_count, text_col=text_col, id_col=id_col
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("tok_start", "tok_end")).alias("_spans"))
        .withColumnRenamed("doc_id", id_col)
    )
    toks = _clean_tokens(text_col)
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda x: ~F.exists(
            F.col("_spans"),
            lambda sp: (x["i"] >= sp["tok_start"]) & (x["i"] < sp["tok_end"]),
        ),
    )
    cleaned = F.array_join(F.transform(kept, lambda x: x["t"]), " ")
    out_cols = [
        F.when(F.col("_spans").isNull(), F.col(c)).otherwise(cleaned).alias(c)
        if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return docs.join(spans, id_col, "left").select(*out_cols)
