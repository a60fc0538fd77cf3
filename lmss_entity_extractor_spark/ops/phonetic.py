"""American Soundex phonetic keys (L242): the classic blocking key for
entity resolution on names — "ROBERT" and "RUPERT" both key to R163,
so typo'd/variant surfaces land in the same block before the expensive
fuzzy scorers (L83 edit join, L197 Jaro-Winkler, L241 Fellegi-Sunter)
run.

Cross-engine design: the WHOLE algorithm is generated as ONE SQL
string from a single Python builder — Spark evaluates it via
``F.expr``, the DuckDB oracle embeds the same text (the `_dot_sql`
trick from ops/similarity.py, applied to string algebra).  Both
engines share the exact semantics of every function used (verified:
``translate`` with short replacement DELETES, ``regexp_replace`` minus
the flag argument — the one signature difference, parameterized as
``g_flag``).  No UDF, no per-engine reimplementation that could drift:
a NARROW whole-stage-codegen projection over 100 TB of names.

Algorithm (the standard American Soundex):
1. keep letters only, uppercase; empty -> NULL key
2. code letters: BFPV->1 CGJKQSXZ->2 DT->3 L->4 MN->5 R->6,
   vowels+Y->0, H/W DELETED (so same-code letters separated by h/w
   collapse, separated by a vowel don't — the spec's corner case)
3. collapse digit runs, drop the first letter's own leading code (iff
   the first letter codes to a digit), drop zeros
4. first letter + first 3 codes, zero-padded

No reference counterpart; ER/blocking analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MATCH = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_CODES = "111122222222334556000000"  # 24 codes; H/W deleted


def soundex_sql(col_sql: str, g_flag: str = "") -> str:
    """The full Soundex of ``col_sql`` as engine-shared SQL text.
    ``g_flag`` is '' for Spark (regexp_replace is global) and
    ", 'g'" for DuckDB (global needs the flag)."""
    clean = f"regexp_replace(upper({col_sql}), '[^A-Z]', ''{g_flag})"
    digits = f"translate({clean}, '{_MATCH}', '{_CODES}')"
    collapsed = digits
    for d in "123456":
        collapsed = (
            f"regexp_replace({collapsed}, '{d}{d}+', '{d}'{g_flag})"
        )
    first = f"substr({clean}, 1, 1)"
    first_code = f"translate({first}, '{_MATCH}', '{_CODES}')"
    # drop the first letter's own leading code iff it codes to 1-6
    tail = (
        f"CASE WHEN {first_code} IN ('1','2','3','4','5','6') "
        f"THEN substr({collapsed}, 2) ELSE {collapsed} END"
    )
    no_zero = f"replace({tail}, '0', '')"
    return (
        f"CASE WHEN length({clean}) = 0 THEN CAST(NULL AS STRING) "
        f"ELSE substr(rpad({first} || {no_zero}, 4, '0'), 1, 4) END"
    )


def soundex_col(col_name: str) -> Column:
    """The Soundex key as a Spark column (generated SQL, no UDF)."""
    return F.expr(soundex_sql(f"`{col_name}`"))


def add_soundex(
    df: DataFrame, col_name: str, out_col: str = "soundex"
) -> DataFrame:
    """Adds the Soundex blocking key of ``col_name`` as ``out_col`` —
    a zero-shuffle projection; feed into the L57/L177 blockers."""
    return df.withColumn(out_col, soundex_col(col_name))
