"""Unicode text normalization — the CCNet/C4 preprocessing trio: NFC
canonicalization (so byte-level dedup isn't defeated by combining-mark
spelling variants), accent stripping (the CCNet hashing normalization),
and HTML tag removal (the C4 first pass over web extracts).

Spark-first split, by where each op can run:

- ``strip_html`` is ONE JVM regexp_replace — whole-stage codegen, fuses
  into the scan, never leaves the JVM;
- ``nfc`` / ``strip_accents`` genuinely need the Unicode character
  database, which Spark SQL does not expose — they are Arrow-batched
  pandas UDFs over ``unicodedata`` (stdlib; no model, no download), the
  documented non-JVM seam, priced per string batch.  ``strip_accents``
  is NFD → drop Mn-category marks — NO recomposition, matching the
  reference behavior of DuckDB's ``strip_accents`` (the oracle), and
  idempotent by construction.

Scale: all three are row-local projections — zero shuffle, arbitrarily
partitionable; at 100 TB they ride the ingest scan.

Reference counterpart: the reference lowercases and fuzzy-matches but
never canonicalizes Unicode (`app/entity_extraction.py`); corpus-level
normalization is part of the beyond-reference LLM-pipeline mandate
(SURVEY §2.11).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from .validate import validation_enabled

#  a tag must OPEN with a letter or '/' — a bare '<' followed by space
#  (prose like "a < b") is not a tag and must survive
_HTML_TAG = r"</?[A-Za-z][^>]*>"


def strip_html(col: Column | str) -> Column:
    """Remove HTML/XML tags (``<name ...>`` / ``</name>``); pure JVM
    regexp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _HTML_TAG, "")


def nfc(col: Column | str) -> Column:
    """Unicode NFC canonical composition (unicodedata, Arrow-batched).
    The UDF is built per call — pandas_udf registration needs an active
    session, so module import stays session-free."""

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return _nfc(F.col(col) if isinstance(col, str) else col)


def strip_accents(col: Column | str) -> Column:
    """NFD-decompose and drop combining marks (category Mn); no
    recomposition — mirrors DuckDB strip_accents, idempotent."""

    @pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(v):
            if v is None:
                return None
            return "".join(
                ch
                for ch in unicodedata.normalize("NFD", v)
                if unicodedata.category(ch) != "Mn"
            )

        return s.map(one)

    return _strip(F.col(col) if isinstance(col, str) else col)


def common_affix_audit(
    df: DataFrame,
    by: list[str],
    text_col: str,
    max_probe: int = 256,
) -> DataFrame:
    """Common-affix template audit (L400): ``(by..., n, prefix_len,
    prefix, suffix_len, suffix)`` — do all texts in a group share a
    boilerplate prefix/suffix (prompt templates, scraped-page chrome,
    injected headers)?  The detector behind template stripping, next
    to line-level boilerplate removal (L38, frequency-based; this is
    EXACT set-level structure).

    Uses the classic order-statistic identity: the longest common
    prefix of a SET of strings equals the LCP of its lexicographic
    MINIMUM and MAXIMUM alone — so the whole group collapses to two
    ``min``/``max`` aggregations (combinable, one exchange) and ONE
    bounded in-row character fold comparing them; suffixes ride the
    same identity on the reversed strings.  No sort, no collect, no
    pairwise anything — 100 TB of documents is one combinable agg.

    The per-row compare fold is bounded by ``max_probe`` characters —
    a reported affix longer than ``max_probe`` is reported AT
    ``max_probe`` (truncation is explicit in the contract: this is a
    template DETECTOR, not a lossless extractor).  NULL texts are
    REFUSED (a missing document is a bug, not an empty template);
    single-text groups report the (truncated) text itself as both
    affixes — the degenerate case, documented.

    No reference counterpart; text-curation analytics per SURVEY
    §2.11."""
    if max_probe < 1:
        raise ValueError("common_affix_audit: max_probe must be >= 1")
    if validation_enabled():
        n_null = df.filter(F.col(text_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"common_affix_audit: {n_null} NULL text(s) — a missing "
                "document is a bug, not an empty template"
            )
    t = F.col(text_col)
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(t).alias("_lo"),
        F.max(t).alias("_hi"),
        F.min(F.reverse(t)).alias("_rlo"),
        F.max(F.reverse(t)).alias("_rhi"),
    )

    def lcp_len(a, b):
        bound = F.least(
            F.least(F.length(a), F.length(b)), F.lit(max_probe)
        )
        # fold: count the run of equal leading chars; -1 marks a
        # mismatch already seen (the run is over)
        run = F.aggregate(
            F.when(bound >= 1, F.sequence(F.lit(1), bound)).otherwise(
                F.array().cast("array<int>")
            ),
            F.lit(0),
            lambda acc, i: F.when(acc < 0, acc).otherwise(
                F.when(
                    a.substr(i, F.lit(1)) == b.substr(i, F.lit(1)),
                    acc + 1,
                ).otherwise(-acc - 1)
            ),
        )
        return F.when(run < 0, -run - 1).otherwise(run)

    plen = lcp_len(F.col("_lo"), F.col("_hi"))
    slen = lcp_len(F.col("_rlo"), F.col("_rhi"))
    return agg.select(
        *by,
        "n",
        plen.alias("prefix_len"),
        F.col("_lo").substr(F.lit(1), plen).alias("prefix"),
        slen.alias("suffix_len"),
        F.reverse(F.col("_rlo").substr(F.lit(1), slen)).alias("suffix"),
    )
