"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm): position-robust fingerprints for
local similarity detection.

Each document's word k-grams are hashed; every window of ``window``
consecutive k-gram hashes contributes its MINIMUM; the distinct selected
hashes are the document's fingerprints.  The winnowing guarantee: any
shared token run of length >= window + k - 1 between two documents
yields at least one shared fingerprint — so joining on fingerprints
finds partial overlaps (quotes, boilerplate, plagiarism) that whole-doc
hashing misses, with O(n / window) fingerprints per document instead of
O(n) grams.

Spark shape: the entire selection is per-row higher-order folds over the
token array (gram hashing, sliding-window minima, sort + adjacent-dedup)
— ONE narrow projection, zero shuffles (plan-asserted in tests), so the
operator rides the corpus scan at any scale.  The pair generator
``fingerprint_overlap_pairs`` is then a keyed self-join on the
fingerprint value — the same banded shape as MinHash-LSH candidate
generation (ops/dedup.py), never all-pairs.

The gram hash is the md5-prefix family shared with ops/dsir.py: the
SELECTION depends on hash ordering, so the hash must be engine-identical
for the DuckDB oracle to re-derive fingerprints exactly (hash collisions
merely merge fingerprints — harmless, and identical on both engines).

No reference counterpart; complements doc_fingerprint (whole-doc rolling
hash, ops/textstats.py) with sub-document granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _clean_tokens


def _gram_hashes(text_col: str, k: int) -> Column:
    """array<long>: md5-prefix (48-bit) hashes of the word k-grams of
    ``text_col``, in order; empty when the text has fewer than k tokens."""
    toks = _clean_tokens(text_col)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("long"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fingerprint, first_window): the winnowing fingerprint
    set of each document — distinct sliding-window minima of the k-gram
    hash sequence, with the smallest window start that selected each.
    Documents with fewer than k tokens produce no rows; documents with
    1..window-1 grams produce exactly one fingerprint (the global min,
    the truncated-window convention)."""
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    ghs = _gram_hashes(text_col, k)
    docs = docs.select(F.col(id_col).alias("doc_id"), ghs.alias("_ghs"))
    ng = F.size(F.col("_ghs"))
    # one struct (min-of-window, start) per window start; frame truncates
    # at the tail so short docs yield the single global-min fingerprint
    wins = F.when(
        ng > 0,
        F.transform(
            F.sequence(F.lit(0), F.greatest(ng - window, F.lit(0))),
            lambda s: F.struct(
                F.array_min(F.slice(F.col("_ghs"), s + 1, window)).alias("fp"),
                s.alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<fp:long,w:int>>"))
    # sort by (fp, w) then keep each fp's first occurrence: distinct
    # fingerprints with their minimal selecting window, still per-row
    swins = F.array_sort(wins)
    dedup = F.filter(
        swins,
        lambda x, i: (i == F.lit(0)) | (x["fp"] != F.get(swins, i - 1)["fp"]),
    )
    return docs.select(
        "doc_id", F.explode(dedup).alias("_s")
    ).select(
        "doc_id",
        F.col("_s.fp").alias("fingerprint"),
        F.col("_s.w").alias("first_window"),
    )


def fingerprint_overlap_pairs(
    fingerprints: DataFrame, min_shared: int = 1
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing >= ``min_shared``
    winnowing fingerprints, doc_a < doc_b — the MOSS candidate-pair
    generator.  A keyed equi-join on the fingerprint value (the LSH-band
    shape): cost is per-fingerprint bucket sizes, never all-pairs."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    a = fingerprints.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fingerprints.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
