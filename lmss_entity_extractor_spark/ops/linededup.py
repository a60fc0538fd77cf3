"""Corpus-level line deduplication / boilerplate removal (L38): the
C4 / RefinedWeb curation rule — drop (or keep only the first occurrence
of) every line that occurs at least ``min_count`` times across the WHOLE
corpus (Raffel et al. 2020 §2.2 "three-sentence span" rule,
Penedo et al. 2023 RefinedWeb line-level filters).

Reference scope: the reference pipeline (app/entity_extraction.py)
filters per-document only; cross-document line dedup is part of the
training-data-curation surface SURVEY §2.11 mandates for the 100 TB
corpus path.

Scale shape — two modes with different physical plans on purpose:

* ``keep_first=False`` (boilerplate removal, the default): line counts
  come from a ``groupBy(line)`` hash aggregation — map-side combinable,
  so the shuffle carries one row per DISTINCT line per task, and the
  resulting blocklist (lines with count >= min_count) is typically tiny
  (boilerplate is frequent by definition).  Dropping is a left anti
  hash join on the line value.  Two keyed shuffles total (blocklist
  build + per-doc reassembly); nothing is all-pairs.
* ``keep_first=True`` (C4-style dedup): the first occurrence must be
  identified globally, so this mode uses one window over
  ``partitionBy(line)`` ordered by (doc_id, pos) — a single shuffle that
  carries every line once, with no map-side combine (inherent to the
  semantics: every occurrence needs its rank).

Reassembly is a per-document sort-agg (``collect_list(struct(pos,
line))`` -> ``array_sort`` -> ``concat_ws``); documents whose lines were
all removed (or that had no non-blank lines) are resurrected by a left
join from the input ids, so the output has exactly one row per input
document.

Keys are the full line strings, not 64-bit hashes: a hash collision in
an anti-join would silently delete an innocent line, and Spark's
hash-agg/exchange already hashes internally.  (At extreme corpus sizes
the narrow-shuffle variant is the same plan with the line replaced by a
128-bit hash pair.)

Determinism: positions are unique within a document and the keep-first
tiebreak is the total order (doc_id, pos), so output is bit-stable
across parallelism and append order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(text_col: str):
    """Non-blank lines of ``text_col`` (array<string>), verbatim —
    blank/whitespace-only lines are dropped on both the counting and
    reassembly sides, so they never count as boilerplate."""
    return F.filter(
        F.split(F.col(text_col), F.lit("\n"), -1),
        lambda l: F.trim(l) != F.lit(""),
    )


def corpus_line_dedup(
    docs: DataFrame,
    min_count: int = 3,
    keep_first: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per input document:

      doc_id, text (kept lines re-joined with ``\\n``, '' if none),
      n_lines_kept, n_lines_removed.

    A line is "frequent" when it occurs >= ``min_count`` times corpus-wide
    (exact match after blank-line removal; leading/trailing spaces are
    significant).  ``keep_first=False`` removes every occurrence of every
    frequent line; ``keep_first=True`` keeps the globally first occurrence
    (smallest (doc_id, pos)) and removes the rest.
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    ids = docs.select(F.col(id_col).alias("doc_id"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_lines(text_col)).alias("pos", "line"),
    )
    if keep_first:
        w_cnt = Window.partitionBy("line")
        w_rank = w_cnt.orderBy("doc_id", "pos")
        flagged = exploded.select(
            "doc_id",
            "pos",
            "line",
            (
                (F.count(F.lit(1)).over(w_cnt) < F.lit(min_count))
                | (F.row_number().over(w_rank) == F.lit(1))
            ).alias("keep"),
        )
    else:
        blocklist = (
            exploded.groupBy("line")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("_cnt") >= F.lit(min_count))
            .select("line", F.lit(False).alias("_blocked"))
        )
        flagged = exploded.join(blocklist, "line", "left").select(
            "doc_id", "pos", "line", F.coalesce("_blocked", F.lit(True)).alias("keep")
        )
    per_doc = flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "keep", "line"))),
                    lambda x: x["keep"],
                ),
                lambda x: x["line"],
            ),
        ).alias("_text"),
        F.sum(F.col("keep").cast("long")).alias("_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("_removed"),
    )
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("_text", F.lit("")).alias("text"),
        F.coalesce("_kept", F.lit(0)).alias("n_lines_kept"),
        F.coalesce("_removed", F.lit(0)).alias("n_lines_removed"),
    )


def frequent_lines(
    docs: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The boilerplate audit view: (line, n_occurrences, n_docs) for every
    line occurring >= ``min_count`` times corpus-wide — one combinable
    aggregation, no join.  ``n_docs`` < ``n_occurrences`` distinguishes
    within-document repetition from cross-document boilerplate."""
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_lines(text_col)).alias("line")
    )
    return (
        exploded.groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= F.lit(min_count))
    )
