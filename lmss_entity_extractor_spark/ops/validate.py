"""Shared input validators for the statistics operators: the loud-
refusal discipline (a silently dropped or truncated row corrupts a
test statistic with no error — worse than failing).

``assert_binary`` checks the RAW column, not an int cast: a double
0.9 truncates to 0 and a string 'yes' casts to NULL, so a cast-based
check would wave both through (found by review r4-2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_binary(df: DataFrame, col: str, opname: str) -> None:
    """Raise ValueError unless every non-NULL value of ``col`` is
    exactly 0 or 1 (numerically — ints, longs, doubles 0.0/1.0 and
    booleans all pass; 0.9, 2, 'yes' all refuse)."""
    d = F.col(col).try_cast("double")
    n_bad = df.filter(
        F.col(col).isNotNull() & (d.isNull() | ~d.isin([0.0, 1.0]))
    ).count()
    if n_bad:
        raise ValueError(
            f"{opname}: {n_bad} row(s) with non-binary value in "
            f"{col!r} — values must be exactly 0 or 1"
        )
