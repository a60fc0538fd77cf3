"""Intra-document repetition metrics (L37): the Gopher/MassiveText
repetition rules (Rae et al. 2021, table A1) — duplicate-line fraction,
duplicate-line character fraction, top-n-gram character coverage,
duplicate-n-gram fraction — as pure per-document column expressions.

Reference scope: the reference pipeline filters transcripts only by
span/score rules (app/entity_extraction.py); repetition filtering is the
training-data-curation extension SURVEY §2.11 mandates for the 100 TB
corpus path.

Scale shape: every metric here is a function of ONE row — tokens are
split, sorted, and folded executor-side with higher-order functions
(``aggregate`` over ``array_sort``), so the whole operator is a single
narrow projection: no shuffle, no UDF, fully whole-stage-codegen'd.
That is the best possible 100 TB shape — repetition scoring rides the
same scan as any other per-doc projection and costs O(tokens log tokens)
per row.

Exactness contract (for the DuckDB oracle): every fraction is a single
IEEE division of exactly-computed integer counts, so Spark and the SQL
oracle produce bit-identical doubles with no summation-order caveat.

Semantics notes:
  * n-grams are FULL windows only (a doc with < n tokens has none), the
    same rule as ops/decontam.py;
  * the top n-gram tie-break is lexicographically-smallest among the
    max-count grams — the fold walks a SORTED gram array with a strict
    ``>`` update, so the first maximal run wins, which IS the smallest;
  * "duplicated line characters" counts every occurrence of a line whose
    per-doc count is > 1 (Gopher's numerator), over the sum of line
    lengths (not raw text length: separators are excluded on both
    sides so the fraction is a pure line property).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.ops.decontam import _full_window_grams
from lmss_entity_extractor_spark.ops.dedup import _clean_tokens


def _full_grams(toks: Column, n: int) -> Column:
    """All full-window n-grams, repeats kept (array<string>) — counting
    repeats is the point here, unlike ops/dedup.py's distinct shingles."""
    return _full_window_grams(toks, n, distinct=False)


def _top_run(arr: Column) -> Column:
    """struct(gram, cnt): the most frequent element of ``arr`` and its
    count, ties to the lexicographically smallest; (NULL, 0) for empty.

    One fold over the sorted array — equal elements are contiguous, so
    the longest run is the max count, and strict ``>`` keeps the first
    (= smallest) maximal run.
    """
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("bestg"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)), acc["best"]
            ).alias("best"),
            F.when(
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) > acc["best"], g
            )
            .otherwise(acc["bestg"])
            .alias("bestg"),
        ),
        lambda acc: F.struct(acc["bestg"].alias("gram"), acc["best"].alias("cnt")),
    )


def _dup_run_chars(arr: Column) -> Column:
    """struct(dup, tot): characters inside elements whose count is > 1
    (every occurrence), and total characters over all occurrences.

    Fold over the sorted array: when a run reaches length 2 the first
    occurrence is charged retroactively (+2·len), later extensions +len.
    """
    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("dup"),
            F.lit(0).cast("long").alias("tot"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                acc["dup"]
                + F.when(
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) == 2,
                    F.length(x).cast("long") * 2,
                )
                .when(
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)) > 2,
                    F.length(x).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
            ).alias("dup"),
            (acc["tot"] + F.length(x).cast("long")).alias("tot"),
        ),
        lambda acc: F.struct(acc["dup"].alias("dup"), acc["tot"].alias("tot")),
    )


def _frac(num: Column, den: Column) -> Column:
    """num/den as double, 0.0 when the denominator is 0 — a single IEEE
    division of exact integers, identical in Spark and the oracle."""
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def repetition_stats(
    docs: DataFrame,
    top_n: int = 2,
    dup_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Per-document repetition metrics (one narrow projection, no shuffle):

      doc_id, n_tokens, n_distinct_tokens,
      dup_token_frac      — 1 − distinct/total token occurrences,
      top_gram, top_gram_count,
      top_gram_char_frac  — count·len(top ``top_n``-gram) / len(text),
      dup_gram_frac       — 1 − distinct/total ``dup_n``-grams,
      dup_line_frac       — 1 − distinct/total lines,
      dup_line_char_frac  — chars in lines occurring > 1× / total line chars.
    """
    toks = _clean_tokens(text_col)
    lines = F.filter(
        F.split(F.col(text_col), re.escape(line_sep), -1),
        lambda l: F.trim(l) != F.lit(""),
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        toks.alias("_toks"),
        _full_grams(toks, top_n).alias("_topg"),
        _full_grams(toks, dup_n).alias("_dupg"),
        lines.alias("_lines"),
    ).select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct_tokens"),
        _frac(
            F.size("_toks") - F.size(F.array_distinct("_toks")), F.size("_toks")
        ).alias("dup_token_frac"),
        _top_run(F.col("_topg")).alias("_top"),
        _frac(
            F.size("_dupg") - F.size(F.array_distinct("_dupg")), F.size("_dupg")
        ).alias("dup_gram_frac"),
        F.size("_lines").alias("_n_lines"),
        F.size(F.array_distinct("_lines")).alias("_n_dlines"),
        _dup_run_chars(F.col("_lines")).alias("_lc"),
        F.length("_text").alias("_n_chars"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "dup_token_frac",
        F.col("_top")["gram"].alias("top_gram"),
        F.col("_top")["cnt"].alias("top_gram_count"),
        _frac(
            F.col("_top")["cnt"].cast("long")
            * F.coalesce(F.length(F.col("_top")["gram"]), F.lit(0)),
            F.col("_n_chars"),
        ).alias("top_gram_char_frac"),
        "dup_gram_frac",
        _frac(F.col("_n_lines") - F.col("_n_dlines"), F.col("_n_lines")).alias(
            "dup_line_frac"
        ),
        _frac(F.col("_lc")["dup"], F.col("_lc")["tot"]).alias("dup_line_char_frac"),
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_gram_char_frac: float = 0.20,
    max_dup_gram_frac: float = 0.60,
    top_n: int = 2,
    dup_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """The corpus minus docs breaching any Gopher-style repetition
    threshold (defaults follow Rae et al. table A1's shape, adapted to
    the n-gram orders exposed here).  ``line_sep`` is the same LITERAL
    separator ``repetition_stats`` uses (regex-escaped before the
    split), so filter decisions always match the reported metrics.

    The metrics are per-row expressions, so this is a plain same-row
    ``filter`` — no join, no shuffle, and (unlike a semi-join on a
    derivative of the corpus) nothing that would have to broadcast the
    100 TB side back at itself.  All original columns pass through."""
    toks = _clean_tokens(text_col)
    lines = F.filter(
        F.split(F.col(text_col), re.escape(line_sep), -1),
        lambda l: F.trim(l) != F.lit(""),
    )
    top = _top_run(_full_grams(toks, top_n))
    dupg = _full_grams(toks, dup_n)
    lc = _dup_run_chars(lines)
    pred = (
        (
            _frac(F.size(lines) - F.size(F.array_distinct(lines)), F.size(lines))
            <= max_dup_line_frac
        )
        & (_frac(lc["dup"], lc["tot"]) <= max_dup_line_char_frac)
        & (
            _frac(
                top["cnt"].cast("long") * F.coalesce(F.length(top["gram"]), F.lit(0)),
                F.length(text_col),
            )
            <= max_top_gram_char_frac
        )
        & (
            _frac(F.size(dupg) - F.size(F.array_distinct(dupg)), F.size(dupg))
            <= max_dup_gram_frac
        )
    )
    return docs.filter(pred)
