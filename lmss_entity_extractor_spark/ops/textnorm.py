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
