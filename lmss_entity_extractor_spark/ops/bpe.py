"""Byte-pair-encoding tokenizer training at corpus scale (Sennrich,
Haddow & Birch, ACL'16 §3.2): count symbol-pair frequencies and learn
merge rules — the tokenizer-training stage of an LLM data pipeline,
re-expressed so the CORPUS is touched exactly once.

The scalability trick is the classic one the paper itself notes: BPE
statistics are a function of the WORD-FREQUENCY table, not of the
corpus.  So:

- one corpus pass builds ``(word, count)`` — a combinable hash
  aggregate whose output is vocabulary-sized (Heaps' law: ~10^6 rows
  for a 100 TB corpus, i.e. broadcastable), and every merge round
  thereafter runs over the VOCABULARY weighted by counts — the 100 TB
  input is never re-read;
- pair counting is pure JVM column algebra: words split to symbol
  arrays, adjacent pairs generated with ``transform(sequence(...))``
  (no Python in the no-merge hot path), then ONE map-side-combinable
  weighted count;
- applying learned merges re-tokenizes the vocabulary (not the
  corpus) with an Arrow-batched pandas UDF — the per-word merge loop
  is the honest non-relational seam, priced per DISTINCT word;
- each training round collects exactly ONE row (the argmax pair,
  deterministic tie-break: highest count, then lexicographically
  smallest pair) — driver traffic is O(n_merges), never O(corpus).

Word model: whitespace tokenization, symbols = characters plus a
terminal ``</w>`` end-of-word marker (the paper's formulation, which
lets merges learn word-final units without crossing word boundaries).

Reference counterpart: none — the reference tokenizes with
spaCy-style library calls per document (`app/entity_extraction.py`);
tokenizer TRAINING is part of the beyond-reference LLM-pipeline
mandate (SURVEY §2.11).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, cnt).  Whitespace split, empty tokens
    dropped; case preserved (normalization is the caller's choice)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _symbols(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, cnt) → (syms array<string>, cnt) with ``merges`` applied
    in training order.  No merges → JVM-only char split + EOW append;
    with merges → vocabulary-sized pandas UDF (documented seam)."""
    if not merges:
        return words.select(
            F.concat(
                F.filter(F.split("word", ""), lambda c: c != ""),
                F.array(F.lit(EOW)),
            ).alias("syms"),
            "cnt",
        )

    from pyspark.sql.functions import pandas_udf

    merge_list = list(merges)

    @pandas_udf("array<string>")
    def apply_merges(word: pd.Series) -> pd.Series:
        def tok(w):
            syms = list(w) + [EOW]
            for left, right in merge_list:
                i, out = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return word.map(tok)

    return words.select(apply_merges("word").alias("syms"), "cnt")


def bpe_pair_counts(
    words: DataFrame, merges: list[tuple[str, str]] = ()
) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the vocabulary:
    (left, right, pair_count).  ``words`` is a (word, cnt) relation
    (see ``word_counts``)."""
    syms = _symbols(words, list(merges))
    # adjacent pairs = zip(arr[:-1], arr[1:]); slice lengths clamp to 0
    # for single-symbol entries (fully-merged words), where
    # sequence(0, size-2) would instead produce a DESCENDING range
    pairs = syms.select(
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1),"
                " slice(syms, 2, size(syms) - 1),"
                " (l, r) -> struct(l AS left, r AS right))"
            )
        ).alias("pair"),
        "cnt",
    )
    return pairs.groupBy(
        F.col("pair.left").alias("left"), F.col("pair.right").alias("right")
    ).agg(F.sum("cnt").alias("pair_count"))


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules.  One corpus pass, then
    vocabulary-sized rounds; each round collects one argmax row."""
    words = word_counts(docs, text_col).persist()
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            top = (
                bpe_pair_counts(words, merges)
                .orderBy(F.col("pair_count").desc(), "left", "right")
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_count"] <= 0:
                break  # vocabulary fully merged — nothing left to learn
            merges.append((top[0]["left"], top[0]["right"]))
        return merges
    finally:
        words.unpersist()
